"""Approximate (sketch) aggregates — the 100 TB substitutes for exact
DISTINCT/quantile operators.

At cluster scale, exact COUNT(DISTINCT) re-shuffles every distinct key
and exact percentiles sort the column; both are unaffordable on 100 TB
inputs. The sketch versions are one map-side pass with tiny mergeable
state: HyperLogLog for cardinality (Spark's datasketches-backed
``hll_sketch_agg``, default ~2% error) and Greenwald-Khanna /
KLL-style ``percentile_approx`` for quantiles.

These cannot be DuckDB-oracle-matched (different sketch
implementations), so they ship as rows-only catalog queries plus
tolerance unit tests against the exact answers (tests/).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_profile(
    df: DataFrame,
    group_col: str,
    distinct_col: str,
    value_col: str,
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group approximate profile: HLL distinct count + quartiles.

    One hash aggregation, all sketch state mergeable map-side — the
    shuffle carries sketches, not rows. ``accuracy`` is
    percentile_approx's inverse-epsilon (10000 → ~0.01% rank error).
    """
    return df.groupBy(group_col).agg(
        F.approx_count_distinct(distinct_col).alias("approx_distinct"),
        F.percentile_approx(
            value_col, [0.25, 0.5, 0.75], accuracy
        ).alias("approx_quartiles"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


def mergeable_distinct_rollup(
    df: DataFrame, bucket_col, key_col: str
) -> tuple[DataFrame, DataFrame]:
    """The sketch-rollup pattern: build one HLL sketch per bucket, then
    merge sketches — NOT rows — for the grand total.

    Returns ``(per_bucket, total)``. ``per_bucket`` holds a binary
    sketch + its estimate per bucket; ``total`` unions the bucket
    sketches into one global estimate. This is how a continuous
    aggregate keeps distinct-counts: the raw data is read once per
    bucket, ever; late rollups touch only sketch bytes. (Exact distinct
    cannot roll up: distinct-per-day does not sum to distinct-per-month.)
    """
    per_bucket = df.groupBy(bucket_col.alias("bucket")).agg(
        F.hll_sketch_agg(key_col).alias("sketch"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    total = per_bucket.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
            "approx_distinct_total"
        )
    )
    return (
        per_bucket.select(
            "bucket",
            F.hll_sketch_estimate("sketch").alias("approx_distinct"),
            "n_rows",
        ),
        total,
    )
