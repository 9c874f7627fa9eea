"""End-to-end corpus deduplication pipeline — the composed workflow a
training-data team runs over a document table:

    1. exact dedup (content-hash groupBy; drop verbatim copies)
    2. MinHash+LSH near-dup candidates over the exact-canonical survivors,
       with the degenerate-bucket cap on (production-safe default)
    3. connected components over the candidate pairs (large-star/small-star:
       diameter-proof) → one canonical per near-dup cluster
    4. write the admitted corpus with the resumable checkpoint sink

Run: python examples/dedup_pipeline.py [sf_dir] [out_dir]
Prints one JSON line of funnel stats.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from seraster_spark import text as TX
from seraster_spark.io import checkpointed_write, read_table
from seraster_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/seraster_dedup_out"
    spark = get_spark("dedup_pipeline", master="local[8]", shuffle_partitions=8)

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    n_in = docs.count()

    # 1. exact dedup: keep the min-id copy of every verbatim-identical text
    exact = TX.exact_dedup(docs).filter(F.col("is_canonical"))
    n_exact = exact.count()

    # 2. near-dup candidates (xxhash64 Arrow production path, capped buckets)
    pairs = TX.minhash_lsh_candidates(
        exact, verify_threshold=0.8, max_bucket_size=100_000
    ).localCheckpoint()
    n_pairs = pairs.count()

    # 3. transitive clusters -> canonical per cluster (star CC: O(log n)
    # rounds even if boilerplate chains produce a high-diameter component)
    if n_pairs:
        clusters = TX.connected_components_star(pairs)
        drop = clusters.filter(F.col("node") != F.col("component")).select(
            F.col("node").alias("doc_id")
        )
        admitted = exact.join(drop, "doc_id", "left_anti")
    else:
        admitted = exact
    n_admitted = admitted.count()

    # 4. resumable partitioned write (unit = doc_id mod 4)
    out = admitted.withColumn("unit", F.pmod("doc_id", F.lit(4)).cast("string"))
    lineage = checkpointed_write(out, out_dir, "unit", [str(u) for u in range(4)])

    spark.stop()
    print(
        json.dumps(
            {
                "docs_in": n_in,
                "after_exact_dedup": n_exact,
                "near_dup_pairs": n_pairs,
                "admitted": n_admitted,
                "units_written": lineage["units_written"],
                "out_dir": out_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
