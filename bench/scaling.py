"""Scaling-efficiency evidence (north_rule: >=0.8 from N to 4N executors).

No real cluster exists in this sandbox, so the same job runs at two
parallelism levels — local[8] vs local[32] (fresh JVM each) — on the same
staged input, per the task brief. Efficiency = throughput_4N / (4 x
throughput_N).

Usage:
  python bench/scaling.py              # orchestrates both runs, writes BENCH.md
  python bench/scaling.py --worker 8   # one measurement, prints JSON
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = int(os.environ.get("SCALING_DOCS", "192000000"))
REPEATS = int(os.environ.get("SCALING_REPEATS", "3"))
STAGE = os.path.join(
    os.environ.get("TMPDIR", "/tmp"), f"scaling_docs_{N_DOCS}"
)


def worker(cpus: int) -> None:
    from pyspark.sql import functions as F

    from bench import SPEC_HX, force, synth_docs
    from seraster_spark import rasterize as R
    from seraster_spark.session import get_spark

    spark = get_spark(
        f"scaling_{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus * 2
    )
    if not os.path.exists(os.path.join(STAGE, "_SUCCESS")):
        # slim columns (the cell-type job never reads `values`) and 64 files
        # for even scan parallelism at both core counts
        synth_docs(spark, N_DOCS).select("doc_id", "x", "y", "kind").repartition(
            64
        ).write.mode("overwrite").parquet(STAGE)
    docs = spark.read.parquet(STAGE)
    # hex binning: the most compute-dense encoder (axial transform + cube
    # rounding per point) — keeps the measurement CPU-bound rather than
    # memory-bandwidth-bound on a single box
    spec = SPEC_HX
    # warmup (untimed)
    force(R.rasterize_cell_type(docs.limit(300_000), 100.0, fun="sum", spec=spec))
    best = None
    for _ in range(REPEATS):
        t0 = time.time()
        n_tiles = force(R.rasterize_cell_type(docs, 100.0, fun="sum", spec=spec))
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    spark.stop()
    print(
        json.dumps(
            {
                "cpus": cpus,
                "docs": N_DOCS,
                "wall_s": round(best, 3),
                "docs_per_sec": round(N_DOCS / best, 1),
                "tiles": n_tiles,
            }
        )
    )


def orchestrate() -> None:
    results = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(cpus)],
            capture_output=True,
            text=True,
            cwd=REPO,
            check=True,
        )
        line = out.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
        print(line)
    t8 = results[8]["docs_per_sec"]
    t32 = results[32]["docs_per_sec"]
    eff = t32 / (4 * t8)
    summary = {
        "throughput_local8_docs_per_sec": t8,
        "throughput_local32_docs_per_sec": t32,
        "speedup_8_to_32": round(t32 / t8, 3),
        "scaling_efficiency_N_to_4N": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
        "docs": N_DOCS,
    }
    print(json.dumps(summary))
    md = f"""# BENCH — throughput & N→4N scaling evidence

Job: `rasterize_cell_type` (HEX res-100, fun=sum, 10%-hot-tile skewed
corpus of {N_DOCS:,} synthetic interleaved docs staged to parquet), full
result materialized via hash-all aggregate. Same input, two parallelism
levels, fresh JVM each, min of {REPEATS} repeats (shared-host noise).

| config | wall (s) | docs/sec |
|---|---|---|
| local[8]  (N)  | {results[8]["wall_s"]} | {t8:,.0f} |
| local[32] (4N) | {results[32]["wall_s"]} | {t32:,.0f} |

**Speedup 8→32 cores: {t32 / t8:.2f}×; scaling efficiency = {eff:.3f}**
(target ≥ 0.8 per BASELINE.json north_rule; sandboxed as local[8] vs
local[32] because no real cluster is available — see task brief).

Notes: local-mode scaling under-reports a real cluster (shared memory
bandwidth + single shuffle service); the plan itself is
partition-parallel — one hash aggregate with map-side combine, no
driver-side loops, broadcast-only joins on the hot path.
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(md)
    print("wrote BENCH.md")


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
    else:
        orchestrate()
