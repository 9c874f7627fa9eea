"""As-of (temporal nearest-predecessor) join.

Spark has no ASOF JOIN operator; the naive formulation — an inequality join
``r.ts <= l.ts`` followed by a per-left-row top-1 — is quadratic per key and
unusable at corpus scale. The classic scalable re-expression used here:

    union both sides onto one timeline → ONE shuffle on the join keys →
    one ordered window pass carrying the latest right-side payload forward
    (``last(..., ignorenulls=True)``) → keep left rows.

Cost = one exchange + one sort, independent of match distance; no
candidate explosion. This is the same single-pass merge a time-series
database performs, expressed declaratively so Catalyst/AQE keep owning
the physical plan.

Determinism: ties at equal timestamp are resolved (a) right-before-left —
an equal-timestamp right row IS visible to the left row (``<=``
semantics), and (b) among equal-timestamp right rows by ``tiebreak``
ascending, so the LAST one (highest tiebreak) wins. Both rules are
mirrored in the driver oracle's ``ORDER BY r.ts DESC, r.tiebreak DESC
LIMIT 1`` formulation.

Skew: one hot key serializes its window partition. For a key carrying an
outsized share of rows, pre-split by a coarse time bucket and as-of join
within buckets after seeding each bucket with the previous bucket's last
right row (range-partition + boundary exchange); not needed for the
benchmark shapes here, documented for the 100 TB operator catalogue.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    right_cols: list[str],
    tiebreak: str | None = None,
    direction: str = "backward",
    tolerance: Column | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For every left row, attach ``right_cols`` from the right row with the
    greatest ``ts_col`` ≤ left's (direction='backward'), or the smallest
    ``ts_col`` ≥ left's ('forward'), within the same ``on`` key group.

    Left rows with no match keep NULLs (left-outer semantics). ``tolerance``
    (a Column in the same units as a ts difference, e.g.
    ``F.expr("INTERVAL 1 HOUR")`` for timestamps or a numeric for numeric
    ts) nulls out matches farther than the bound.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    payload = list(right_cols)
    if ts_col not in payload:
        payload = [ts_col, *payload]
    if tiebreak is not None and tiebreak not in payload:
        payload = [*payload, tiebreak]

    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("_src"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in payload],
    )
    r_tag = right.select(
        *[F.col(c) for c in on],
        F.col(ts_col),
        F.lit(0).alias("_src"),
        *[F.col(c).alias(f"_r_{c}") for c in payload],
    )
    # align schemas: right rows carry NULL for left-only columns
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = r_tag.select(*l_tag.columns).unionByName(l_tag)

    if direction == "backward":
        order = [F.col(ts_col).asc(), F.col("_src").asc()]
        frame = (Window.unboundedPreceding, Window.currentRow)
    else:
        order = [F.col(ts_col).desc(), F.col("_src").asc()]
        frame = (Window.unboundedPreceding, Window.currentRow)
    if tiebreak is not None:
        # among equal-ts right rows the highest tiebreak wins = is the last
        # row the carry-forward sees; must order AFTER _src so equal-ts
        # rights still precede lefts (left rows have a NULL tiebreak)
        order.append(F.col(f"_r_{tiebreak}").asc_nulls_first())

    w = Window.partitionBy(*on).orderBy(*order).rowsBetween(*frame)
    matched = u
    for c in payload:
        matched = matched.withColumn(f"{prefix}{c}", F.last(f"_r_{c}", ignorenulls=True).over(w))

    out = matched.filter(F.col("_src") == 1).drop(
        "_src", *[f"_r_{c}" for c in payload]
    )
    if tolerance is not None:
        gap = (
            F.col(ts_col) - F.col(f"{prefix}{ts_col}")
            if direction == "backward"
            else F.col(f"{prefix}{ts_col}") - F.col(ts_col)
        )
        keep = gap <= tolerance
        for c in payload:
            out = out.withColumn(
                f"{prefix}{c}", F.when(keep, F.col(f"{prefix}{c}"))
            )
    return out
