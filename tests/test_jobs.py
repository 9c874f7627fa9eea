"""End-to-end job runner test: rasterize job with checkpointed resumable
output, lineage + metrics (north_rule)."""

import json
import os

from seraster_spark import fixtures


def test_rasterize_job_end_to_end(spark, tmp_path, monkeypatch):
    # stage input
    in_dir = str(tmp_path / "docs_in")
    fixtures.documents_df(spark, n=1500, seed=7).write.parquet(in_dir)
    out_dir = str(tmp_path / "tiles_out")

    # jobs.run builds its own session via get_spark(); point it at the test
    # master and reuse the active session (getOrCreate)
    monkeypatch.setenv("SPARK_GRAFT_MASTER", "local[8]")
    from seraster_spark import jobs

    metrics = jobs.run(
        [
            "--input", in_dir,
            "--output", out_dir,
            "--resolution", "100",
            "--mode", "square",
            "--fun", "sum",
            "--units", "4",
        ]
    )
    assert metrics["units_written"] == 4
    assert metrics["rows_written"] > 0

    # output readable, unit dirs present
    total = 0
    for u in range(4):
        p = os.path.join(out_dir, f"unit={u}")
        assert os.path.exists(p)
        total += spark.read.parquet(p).count()
    assert total == metrics["rows_written"]

    # rerun = full skip (resume idempotency)
    metrics2 = jobs.run(
        [
            "--input", in_dir,
            "--output", out_dir,
            "--resolution", "100",
            "--mode", "square",
            "--fun", "sum",
            "--units", "4",
        ]
    )
    assert metrics2["units_written"] == 0
    assert metrics2["units_skipped"] == 4

    # lineage log records both runs
    with open(os.path.join(out_dir, "_lineage.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    stages = [r.get("stage") for r in recs]
    assert stages.count("rasterize_job") == 2
