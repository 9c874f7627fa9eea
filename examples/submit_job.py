"""spark-submit entry point (north_rule: "run via spark-submit --py-files").

    python tools/make_pyfiles_zip.py
    spark-submit --py-files dist/seraster_spark.zip examples/submit_job.py \
        [sf_dir] [out_dir]

Runs the flagship cell-type rasterization over the given testdata dir and
writes the tiles with a checkpointed, resumable, lineage-recording sink —
re-running after a kill resumes from the manifest (io.checkpointed_write).
Prints one JSON status line.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession, functions as F

from seraster_spark import driver_queries as DQ
from seraster_spark.io import checkpointed_write


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/seraster_submit_out"
    spark = SparkSession.builder.appName("seraster_submit").getOrCreate()
    tiles = DQ.q_raster_square_kind_sum(spark, sf_dir)
    # unit = coarse row band → per-partition checkpoint/resume/lineage
    with_unit = tiles.withColumn(
        "unit", F.pmod(F.col("row_i"), F.lit(4)).cast("string")
    )
    lineage = checkpointed_write(
        with_unit, out_dir, "unit", [str(u) for u in range(4)]
    )
    n = spark.read.parquet(out_dir).count()
    print(
        json.dumps(
            {
                "status": "ok",
                "rows_written": n,
                "units_written": lineage["units_written"],
                "units_skipped": lineage["units_skipped"],
                "out_dir": out_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
