"""Graft-specific invariants: the interleaved span payload must survive the
full pipeline unchanged (BASELINE.json input_hint: per-document
(kind, text, media_ref, offset-order) equality)."""

from pyspark.sql import functions as F

from seraster_spark import permutate, rasterize
from seraster_spark.bbox import grid_spec_for


def span_hashes(df):
    return df.select("doc_id", F.sha2(F.to_json(F.col("spans")), 256).alias("h"))


def test_span_sequence_survives_full_pipeline(spark, docs):
    """permutate -> rasterize with roster -> re-join docs by roster membership:
    every doc's span sequence is byte-identical to the input."""
    before = span_hashes(docs).withColumnRenamed("h", "h0")

    fan = permutate.permutate_by_rotation(docs, n_perm=3)
    spec = grid_spec_for(fan, 100.0, square=True)
    tiles = rasterize.rasterize_cell_type(
        fan, 100.0, fun="sum", group_cols=["perm"], spec=spec, collect_roster=True
    )
    # docs that made it into any tile roster
    member = (
        tiles.select(F.explode("cellID_list").alias("doc_id")).distinct()
    )
    # all docs participate (no drops)
    assert member.count() == docs.count()

    after = span_hashes(fan.select("doc_id", "spans").distinct()).withColumnRenamed(
        "h", "h1"
    )
    bad = before.join(after, "doc_id").filter(F.col("h0") != F.col("h1")).count()
    assert bad == 0


def test_spans_full_equality_sample(spark, docs):
    """Beyond hashes: full struct equality on a sample, field order included."""
    fan = permutate.permutate_by_rotation(docs, n_perm=2).filter(
        F.col("perm") == "rotated_180"
    )
    j = (
        docs.select("doc_id", F.col("spans").alias("s0"))
        .join(fan.select("doc_id", F.col("spans").alias("s1")), "doc_id")
        .limit(200)
    )
    rows = j.collect()
    assert len(rows) == 200
    for r in rows:
        assert r["s0"] == r["s1"]
        offs = [s["offset"] for s in r["s1"]]
        assert offs == sorted(offs)  # offset order preserved


def test_spans_never_in_aggregate_plan(spark, docs):
    """Scale guard: the tile aggregation plan must not shuffle the spans
    payload — check the optimized plan's aggregate output doesn't reference
    'spans'."""
    tiles = rasterize.rasterize_cell_type(docs, 100.0, fun="sum")
    plan = tiles._jdf.queryExecution().optimizedPlan().toString()
    agg_lines = [l for l in plan.splitlines() if "Aggregate" in l]
    assert agg_lines, plan
    for l in agg_lines:
        assert "spans" not in l, l
