"""Checkpoint/resume + lineage tests (north_rule: resumable from
per-partition checkpoints with lineage + metrics)."""

import json
import os

from pyspark.sql import functions as F

from seraster_spark import io as sio
from seraster_spark import rasterize
from seraster_spark.bbox import grid_spec_for


def _tiles(spark, docs):
    spec = grid_spec_for(docs, 200.0, square=True)
    t = rasterize.rasterize_cell_type(docs, 200.0, fun="sum", spec=spec)
    return t.withColumn("unit", F.pmod(F.col("grid_index"), F.lit(4)).cast("string"))


def test_checkpointed_write_and_resume(spark, docs, tmp_path):
    tiles = _tiles(spark, docs).cache()
    out = str(tmp_path / "tiles_out")
    units = ["0", "1", "2", "3"]

    # first run: write only half the units (simulated crash after 2)
    rec1 = sio.checkpointed_write(tiles, out, "unit", units[:2], job_id="job1")
    assert rec1["units_written"] == 2
    assert sio.completed_units(spark, out) == {"0", "1"}

    # resume: all 4 requested, only the 2 missing are written
    rec2 = sio.checkpointed_write(tiles, out, "unit", units, job_id="job2")
    assert rec2["units_skipped"] == 2
    assert rec2["units_written"] == 2
    assert sio.completed_units(spark, out) == {"0", "1", "2", "3"}

    # data round-trips completely
    back = spark.read.parquet(os.path.join(out, "unit=0"))
    for u in units[1:]:
        back = back.unionByName(spark.read.parquet(os.path.join(out, f"unit={u}")))
    assert back.count() == tiles.count()

    # third run: everything skipped (idempotent)
    rec3 = sio.checkpointed_write(tiles, out, "unit", units, job_id="job3")
    assert rec3["units_written"] == 0

    # lineage log has all three runs
    with open(os.path.join(out, "_lineage.jsonl")) as f:
        lines = [json.loads(l) for l in f]
    assert [l["job_id"] for l in lines] == ["job1", "job2", "job3"]


def test_read_table(spark):
    df = sio.read_table(spark, "/root/testdata/sf0.001", "documents")
    assert df.count() > 0
    assert "doc_id" in df.columns


def test_write_tiles_partitioned(spark, docs, tmp_path):
    tiles = _tiles(spark, docs)
    out = str(tmp_path / "part_out")
    sio.write_tiles(tiles, out, partition_by=["unit"])
    # partition pruning: reading one unit touches one directory
    one = spark.read.parquet(out).filter(F.col("unit") == "2")
    assert 0 < one.count() < tiles.count()


def test_checkpointed_write_counts_in_one_job(spark, docs, tmp_path):
    """Manifest row counts come from ONE grouped job over the written root,
    not one read+count job per unit (per-unit jobs are thousands of
    scheduler round-trips at scale)."""
    n_units = 8
    tiles = (
        _tiles(spark, docs)
        .withColumn("unit", F.pmod(F.col("grid_index"), F.lit(n_units)).cast("string"))
        .localCheckpoint()  # materialize upstream first
    )
    out = str(tmp_path / "tiles_out_jobcount")
    units = [str(u) for u in range(n_units)]
    sc = spark.sparkContext
    sc.setJobGroup("cw_jobcount", "checkpointed_write job count")
    try:
        rec = sio.checkpointed_write(tiles, out, "unit", units, job_id="jobX")
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert rec["units_written"] == n_units
    assert sum(r["rows"] for r in rec["records"]) == tiles.count()
    ids = sc.statusTracker().getJobIdsForGroup("cw_jobcount")
    # write job + one grouped count (+AQE stage-materialization slack) —
    # the old per-unit count loop was 1 + n_units = 9 jobs here
    assert 0 < len(ids) <= 5, f"expected <=5 jobs, saw {len(ids)}"
