import pytest
from pyspark.sql import functions as F

from seraster_spark.sketch import hash_sample, kmv_distinct, md5_uniform


def _vals(spark, n, dups=1):
    return spark.range(n).selectExpr(
        f"concat('val_', CAST(id % {n // dups if dups > 1 else n} AS STRING)) AS s"
    )


def test_kmv_exact_below_k(spark):
    df = _vals(spark, 50)
    row = kmv_distinct(df, F.col("s"), k=128).first()
    assert row["k_used"] == 50
    assert row["est_distinct"] == 50.0


def test_kmv_duplicates_dont_consume_slots(spark):
    # 40 distinct values, each repeated 10x: still exact
    df = _vals(spark, 400, dups=10)
    row = kmv_distinct(df, F.col("s"), k=64).first()
    assert row["k_used"] == 40
    assert row["est_distinct"] == 40.0


def test_kmv_partitioning_invariant(spark):
    df = _vals(spark, 5000)
    a = kmv_distinct(df.repartition(1), F.col("s"), k=256).first()
    b = kmv_distinct(df.repartition(13), F.col("s"), k=256).first()
    assert a["kth_hex"] == b["kth_hex"]
    assert a["est_distinct"] == b["est_distinct"]


def test_kmv_estimate_accuracy(spark):
    n = 5000
    row = kmv_distinct(_vals(spark, n), F.col("s"), k=256).first()
    assert row["k_used"] == 256
    # KMV relative error ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert abs(row["est_distinct"] - n) / n < 0.25


def test_md5_uniform_range_and_determinism(spark):
    df = spark.range(1000).select(md5_uniform(F.col("id"), salt="t").alias("u"))
    mn, mx, avg = df.agg(F.min("u"), F.max("u"), F.avg("u")).first()
    assert 0.0 <= mn and mx < 1.0
    assert 0.4 < avg < 0.6
    again = spark.range(1000).select(md5_uniform(F.col("id"), salt="t").alias("u"))
    assert df.exceptAll(again).count() == 0


def test_hash_sample_is_monotone_in_rate(spark):
    """Raising the rate only ADDS rows — the hash-threshold property that
    makes sample sizes tunable without reshuffling the selection."""
    df = spark.range(2000)
    small = {r["id"] for r in hash_sample(df, F.col("id"), rate=0.2, salt="s").collect()}
    big = {r["id"] for r in hash_sample(df, F.col("id"), rate=0.5, salt="s").collect()}
    assert small <= big
    assert 0.12 * 2000 < len(small) < 0.28 * 2000
    assert 0.4 * 2000 < len(big) < 0.6 * 2000


def test_hash_sample_stratified_rates(spark):
    df = spark.range(6000).withColumn(
        "lang", F.when(F.col("id") % 2 == 0, "en").otherwise("rare")
    )
    s = hash_sample(
        df, F.col("id"), strata=F.col("lang"),
        rates={"en": 0.1, "rare": 0.9}, default_rate=0.0, salt="mix",
    )
    counts = {r["lang"]: r["n"] for r in s.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert 0.05 * 3000 < counts["en"] < 0.16 * 3000
    assert 0.84 * 3000 < counts["rare"] < 0.96 * 3000


def test_hash_sample_partitioning_invariant(spark):
    df = spark.range(3000)
    a = sorted(r["id"] for r in hash_sample(df.repartition(1), F.col("id"), rate=0.3).collect())
    b = sorted(r["id"] for r in hash_sample(df.repartition(17), F.col("id"), rate=0.3).collect())
    assert a == b


def test_hash_sample_requires_rate_or_strata(spark):
    df = spark.range(10)
    with pytest.raises(ValueError):
        hash_sample(df, F.col("id"))
    with pytest.raises(ValueError):
        hash_sample(df, F.col("id"), strata=F.col("id"))


def test_kmv_no_full_shuffle_of_hashes(spark):
    """The pre-aggregation property: only ≤ k rows per partition reach the
    exchange — asserted structurally: the mapInPandas sits BELOW the first
    exchange in the plan."""
    df = _vals(spark, 2000).repartition(8)
    sk = kmv_distinct(df, F.col("s"), k=64)
    plan = sk._jdf.queryExecution().executedPlan().toString()
    # partial kernel (ArrowEvalPython/MapInPandas) must appear after the
    # LAST exchange in the printed tree (deeper = later in string)
    import re
    ex = [m.start() for m in re.finditer("Exchange", plan)]
    mp = plan.find("MapInPandas")
    assert mp > ex[0], plan


def test_hash_sample_null_keys_not_silently_dropped(spark):
    df = spark.createDataFrame([(1,), (None,), (3,)], "id long")
    kept = hash_sample(df, F.col("id"), rate=1.0, salt="s").count()
    assert kept == 3  # rate 1.0 keeps everything, NULL keys included


# --- Misra-Gries heavy hitters ---------------------------------------------


def _hh_fixture(spark, n_parts=8):
    """Zipf-ish corpus: token t_i appears ~N/i times; plus a hapax tail."""
    from pyspark.sql import functions as F

    base = spark.range(0, 30_000).select(
        F.concat(
            F.lit("t"),
            F.floor(
                F.pow(F.lit(2.0), F.floor(F.log2(F.col("id") % 8192 + 1)))
            ).cast("long").cast("string"),
        ).alias("tok")
    )
    tail = spark.range(0, 5_000).select(
        F.concat(F.lit("rare"), F.col("id").cast("string")).alias("tok")
    )
    return base.unionByName(tail).repartition(n_parts)


def test_heavy_hitters_invariants(spark):
    """est <= true <= est + err_bound for every reported key, and every key
    with true count > err_bound is present in a big-enough summary."""
    from pyspark.sql import functions as F

    from seraster_spark.sketch import heavy_hitters

    df = _hh_fixture(spark)
    exact = {
        r["tok"]: r["n"]
        for r in df.groupBy("tok").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got = heavy_hitters(df, F.col("tok"), k=15, capacity=64).collect()
    assert 0 < len(got) <= 15
    d = got[0]["err_bound"]
    for r in got:
        true = exact[r["key"]]
        assert r["est_count"] <= true <= r["est_count"] + d, (r, true)
    # membership guarantee, checked through a full summary (top-k may
    # legitimately crowd out a > D key with other > D keys)
    full = {
        r["key"]
        for r in heavy_hitters(df, F.col("tok"), k=10**9, capacity=64).collect()
    }
    for tok, true in exact.items():
        if true > d:
            assert tok in full, (tok, true, d)


def test_heavy_hitters_exact_when_capacity_suffices(spark):
    """capacity >= per-partition distinct keys => no decrements: est ==
    exact counts and err_bound == 0 (the deterministic regime)."""
    from pyspark.sql import functions as F

    from seraster_spark.sketch import heavy_hitters

    df = spark.range(0, 10_000).select(
        F.concat(F.lit("k"), (F.col("id") % 37).cast("string")).alias("tok")
    ).repartition(4)
    got = {r["key"]: (r["est_count"], r["err_bound"]) for r in
           heavy_hitters(df, F.col("tok"), k=50, capacity=1000).collect()}
    exact = {
        "k" + str(i): sum(1 for x in range(10_000) if x % 37 == i) for i in range(37)
    }
    assert all(e == 0 for _, e in got.values())
    assert {k: c for k, (c, _) in got.items()} == exact


def test_heavy_hitters_partition_invariant_guarantee(spark):
    """The invariants hold under different partitionings (counts may vary,
    the bounds may not)."""
    from pyspark.sql import functions as F

    from seraster_spark.sketch import heavy_hitters

    for n_parts in (2, 16):
        df = _hh_fixture(spark, n_parts)
        exact = {
            r["tok"]: r["n"]
            for r in df.groupBy("tok").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        got = heavy_hitters(df, F.col("tok"), k=10, capacity=128).collect()
        d = got[0]["err_bound"]
        for r in got:
            assert r["est_count"] <= exact[r["key"]] <= r["est_count"] + d


def test_heavy_hitters_null_keys_counted(spark):
    """NULL is a legitimate (often heaviest) key — it must be sketched and
    reported as a NULL key, not silently dropped (hash_sample convention)."""
    from pyspark.sql import functions as F

    from seraster_spark.sketch import heavy_hitters

    df = spark.range(0, 1000).select(
        F.when(F.col("id") % 2 == 0, None)
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 7).cast("string")))
        .alias("tok")
    ).repartition(4)
    got = heavy_hitters(df, F.col("tok"), k=3, capacity=100).collect()
    assert got[0]["key"] is None and got[0]["est_count"] == 500


# --- histogram quantile sketch ---------------------------------------------


def test_histogram_quantiles_uniform_exactish(spark):
    """Uniform values over one bin: interpolation is exact (t maps linearly
    inside a single bin)."""
    from pyspark.sql import functions as F

    from seraster_spark.sketch import histogram_quantiles

    df = spark.range(0, 1000).select((F.col("id") % 100).cast("double").alias("v"))
    out = histogram_quantiles(
        df, F.col("v"), [0.5, 0.9], [0.0, 100.0, 200.0]
    ).collect()[0]
    assert abs(out["q_50"] - 50.0) < 1.0
    assert abs(out["q_90"] - 90.0) < 1.0


def test_histogram_quantiles_vs_exact(spark):
    """Estimates land within one bin width of the exact percentile, per
    group; clamped outliers stay inside the last bin."""
    from pyspark.sql import functions as F

    from seraster_spark.sketch import histogram_quantiles

    df = spark.range(0, 5000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.pmod(F.xxhash64("id"), F.lit(750)).cast("double")
         + F.when(F.col("id") % 97 == 0, 10_000.0).otherwise(0.0)).alias("v"),
    )
    edges = [0.0, 50.0, 100.0, 200.0, 400.0, 800.0]
    hq = {r["g"]: r for r in histogram_quantiles(
        df, F.col("v"), [0.5, 0.9], edges, group_cols=["g"]).collect()}
    exact = {r["g"]: r for r in df.groupBy("g").agg(
        F.percentile(F.col("v"), F.lit(0.5)).alias("p50"),
        F.percentile(F.col("v"), F.lit(0.9)).alias("p90")).collect()}
    for g in exact:
        widths = {e: edges[i + 1] - edges[i] for i, e in enumerate(edges[:-1])}
        assert abs(hq[g]["q_50"] - exact[g]["p50"]) <= 200.0
        assert abs(hq[g]["q_90"] - exact[g]["p90"]) <= 400.0
        assert hq[g]["q_90"] <= edges[-1]  # clamped outliers never escape


def test_histogram_quantiles_partition_invariant(spark):
    """Bit-identical output across partitionings (the determinism claim)."""
    from pyspark.sql import functions as F

    from seraster_spark.sketch import histogram_quantiles

    base = spark.range(0, 4000).select(
        (F.pmod(F.xxhash64("id"), F.lit(1000))).cast("double").alias("v")
    )
    edges = [0.0, 100.0, 300.0, 1000.0]
    a = histogram_quantiles(base.repartition(2), F.col("v"), [0.5], edges).collect()[0]
    b = histogram_quantiles(base.repartition(17), F.col("v"), [0.5], edges).collect()[0]
    assert a["q_50"] == b["q_50"]  # bitwise


def test_histogram_quantiles_validation(spark):
    import pytest
    from pyspark.sql import functions as F

    from seraster_spark.sketch import histogram_quantiles

    df = spark.range(3).select(F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError, match="boundaries"):
        histogram_quantiles(df, F.col("v"), [0.5], [0.0, 1.0])
    with pytest.raises(ValueError, match="ascending"):
        histogram_quantiles(df, F.col("v"), [0.5], [1.0, 0.0, 2.0])


def test_histogram_quantiles_ignores_nulls(spark):
    """NULL values are excluded before binning (percentile/quantile_cont
    semantics): 100 values + 50 NULLs estimates from the 100 values alone
    — the ADVICE-r4 scenario where NULLs landed in a first-sorting NULL
    bin and inflated the group total. All-NULL groups vanish."""
    from pyspark.sql import functions as F

    from seraster_spark.sketch import histogram_quantiles

    vals = spark.range(0, 100).select(
        F.lit("a").alias("g"), F.col("id").cast("double").alias("v")
    )
    nulls = spark.range(0, 50).select(
        F.lit("a").alias("g"), F.lit(None).cast("double").alias("v")
    )
    all_null = spark.range(0, 10).select(
        F.lit("b").alias("g"), F.lit(None).cast("double").alias("v")
    )
    df = vals.unionByName(nulls).unionByName(all_null)
    edges = [0.0, 25.0, 50.0, 75.0, 100.0]
    out = {r["g"]: r for r in histogram_quantiles(
        df, F.col("v"), [0.5], edges, group_cols=["g"]
    ).collect()}
    assert set(out) == {"a"}  # all-NULL group has no defined quantile
    clean = histogram_quantiles(
        vals, F.col("v"), [0.5], edges, group_cols=["g"]
    ).collect()[0]
    assert out["a"]["q_50"] == clean["q_50"]  # NULLs changed nothing
    assert abs(out["a"]["q_50"] - 50.0) <= 1.0


def test_heavy_hitters_single_hot_batch_bounded(spark):
    """One partition, one high-cardinality stream (distinct keys >> 2x
    capacity forces the IN-BATCH prune): invariants still hold and the
    summary still surfaces the genuinely heavy keys."""
    from pyspark.sql import functions as F

    from seraster_spark.sketch import heavy_hitters

    # 20k distinct singletons + 3 heavy keys of 5k each, ONE partition
    singles = spark.range(0, 20_000).select(
        F.concat(F.lit("s"), F.col("id").cast("string")).alias("tok")
    )
    heavy = spark.range(0, 15_000).select(
        F.concat(F.lit("H"), (F.col("id") % 3).cast("string")).alias("tok")
    )
    df = singles.unionByName(heavy).coalesce(1)
    got = heavy_hitters(df, F.col("tok"), k=3, capacity=32).collect()
    d = got[0]["err_bound"]
    assert {r["key"] for r in got} == {"H0", "H1", "H2"}
    for r in got:
        assert r["est_count"] <= 5_000 <= r["est_count"] + d


# ---------------------------------------------------------------------------
# Bloom filter word table


def test_bloom_no_false_negatives(spark):
    from seraster_spark.sketch import bloom_filter_build, bloom_maybe_contains

    keys = _vals(spark, 500)
    words = bloom_filter_build(keys, F.col("s"), num_bits=1 << 14, num_hashes=5)
    probed = bloom_maybe_contains(
        keys, F.col("s"), words, 1 << 14, 5, "maybe"
    )
    # every inserted key MUST probe positive
    assert probed.filter(~F.col("maybe")).count() == 0


def test_bloom_rules_out_most_absent_keys(spark):
    from seraster_spark.sketch import bloom_filter_build, bloom_maybe_contains

    keys = _vals(spark, 500)
    absent = spark.range(500).selectExpr("concat('other_', id) AS s")
    # 16384 bits for 500 keys (~33 bits/key), k=5 -> fp well under 1%
    words = bloom_filter_build(keys, F.col("s"), num_bits=1 << 14, num_hashes=5)
    fp = (
        bloom_maybe_contains(absent, F.col("s"), words, 1 << 14, 5, "maybe")
        .filter(F.col("maybe"))
        .count()
    )
    assert fp <= 25, f"false-positive count unexpectedly high: {fp}/500"


def test_bloom_build_is_partitioning_invariant(spark):
    from seraster_spark.sketch import bloom_filter_build

    keys = _vals(spark, 300)
    a = {
        r["word_ix"]: r["word"]
        for r in bloom_filter_build(
            keys.repartition(1), F.col("s"), num_bits=1 << 12, num_hashes=3
        ).collect()
    }
    b = {
        r["word_ix"]: r["word"]
        for r in bloom_filter_build(
            keys.repartition(13), F.col("s"), num_bits=1 << 12, num_hashes=3
        ).collect()
    }
    assert a == b


def test_bloom_word_table_bounded(spark):
    from seraster_spark.sketch import bloom_filter_build

    keys = _vals(spark, 2000)
    words = bloom_filter_build(keys, F.col("s"), num_bits=1 << 10, num_hashes=7)
    rows = words.collect()
    assert len(rows) <= (1 << 10) // 64
    assert all(0 <= r["word_ix"] < (1 << 10) // 64 for r in rows)


def test_bloom_rejects_bad_params(spark):
    from seraster_spark.sketch import bloom_filter_build, bloom_maybe_contains

    keys = _vals(spark, 10)
    with pytest.raises(ValueError):
        bloom_filter_build(keys, F.col("s"), num_bits=100, num_hashes=2)
    with pytest.raises(ValueError):
        bloom_filter_build(keys, F.col("s"), num_bits=1 << 10, num_hashes=0)
    words = bloom_filter_build(keys, F.col("s"), num_bits=1 << 10, num_hashes=2)
    # the probe re-checks the scalar preconditions (a mismatch vs the build
    # would silently produce false negatives)
    with pytest.raises(ValueError):
        bloom_maybe_contains(keys, F.col("s"), words, 100, 2)
    with pytest.raises(ValueError):
        bloom_maybe_contains(keys, F.col("s"), words, 1 << 10, 0)
    # internal/output column collisions fail loudly instead of dropping data
    with pytest.raises(ValueError):
        bloom_maybe_contains(
            keys.withColumn("_bw", F.lit(1)), F.col("s"), words, 1 << 10, 2
        )
    with pytest.raises(ValueError):
        bloom_maybe_contains(
            keys.withColumn("maybe", F.lit(True)), F.col("s"), words, 1 << 10, 2, "maybe"
        )


def test_bloom_merge_equals_single_build(spark):
    """Merging per-batch filters == building over the union of keys, word
    for word (bit_or associativity) — the persisted-ingest-filter update
    path."""
    from seraster_spark.sketch import bloom_filter_build, bloom_filter_merge

    a = spark.range(0, 300).selectExpr("concat('k', id) AS s")
    b = spark.range(300, 500).selectExpr("concat('k', id) AS s")
    both = spark.range(0, 500).selectExpr("concat('k', id) AS s")
    merged = {
        r["word_ix"]: r["word"]
        for r in bloom_filter_merge(
            bloom_filter_build(a, F.col("s"), 1 << 12, 4),
            bloom_filter_build(b, F.col("s"), 1 << 12, 4),
        ).collect()
    }
    single = {
        r["word_ix"]: r["word"]
        for r in bloom_filter_build(both, F.col("s"), 1 << 12, 4).collect()
    }
    assert merged == single
    with pytest.raises(ValueError):
        bloom_filter_merge()


def test_bloom_probe_stays_broadcast_and_unshuffled(spark):
    """The prefilter's 100 TB contract: the probed side is joined only by
    BroadcastHashJoin — no SortMergeJoin and no hash-partitioning exchange
    of the probe side anywhere in the prefilter plan."""
    from seraster_spark.sketch import bloom_filter_build, bloom_maybe_contains

    keys = _vals(spark, 200)
    words = bloom_filter_build(keys, F.col("s"), num_bits=1 << 12, num_hashes=4)
    probed = bloom_maybe_contains(keys, F.col("s"), words, 1 << 12, 4, "maybe")
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    # register-blocked layout: ONE probe join regardless of num_hashes
    assert plan.count("BroadcastHashJoin") == 1, plan
