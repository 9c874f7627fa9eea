"""Measure focal_stats impl='column' (Generate explode) vs impl='arrow'
(fused bincount partials) at growing stencil sizes on a synthetic raster.

The question round-6-plan item 3 asks: does the segment-op fused-partials
pattern pay off for the focal neighbor expansion, and from which radius?
The column path copies the full row (2r+1)² times through Generate before
the hash aggregate; the arrow path crosses only O(distinct target cells)
rows per batch. Win should grow with radius.

Usage: python bench/focal_impl.py  [env: FOCAL_TILES=400000 FOCAL_CPUS=8]
Prints one JSON line per (radius, impl) with min-of-3 seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from seraster_spark.focal import focal_stats  # noqa: E402
from seraster_spark.session import get_spark  # noqa: E402

N_TILES = int(os.environ.get("FOCAL_TILES", "400000"))
CPUS = int(os.environ.get("FOCAL_CPUS", "8"))
REPS = int(os.environ.get("FOCAL_REPS", "3"))


def main() -> None:
    spark = get_spark(
        "focal-impl", master=f"local[{CPUS}]", shuffle_partitions=max(CPUS, 16)
    )
    side = int(N_TILES**0.5)
    # dense side×side integer raster, multi-partition, pre-materialized so
    # the measurement is the focal op, not the synthesis
    raster = (
        spark.range(0, side * side)
        .select(
            (F.col("id") / side).cast("long").alias("row_i"),
            F.pmod(F.col("id"), F.lit(side)).cast("long").alias("col_i"),
            F.pmod(F.xxhash64("id"), F.lit(1000)).alias("n"),
        )
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(eager=True)
    )
    print(f"# raster {side}x{side} = {side * side} tiles, local[{CPUS}]", flush=True)
    for radius in (1, 3, 5, 7):
        row = {"radius": radius, "stencil": (2 * radius + 1) ** 2}
        for impl in ("column", "arrow"):
            best = float("inf")
            for _ in range(REPS):
                t0 = time.time()
                n = focal_stats(raster, "n", radius=radius, impl=impl).count()
                best = min(best, time.time() - t0)
            row[impl] = round(best, 3)
            row["rows"] = n
        row["speedup_arrow"] = round(row["column"] / row["arrow"], 2)
        print(json.dumps(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
