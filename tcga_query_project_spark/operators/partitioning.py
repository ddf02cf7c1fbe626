"""Partition-shape utilities (physical-layer helpers).

Catalyst decides join/agg strategies, but the *input* partition count
is set by the file layout: a small or single-row-group parquet file
arrives as ONE split, and any CPU-heavy per-row stage downstream
(tokenize → shingle → hash, vector kernels) then runs on one core no
matter how many executors exist. At cluster scale inputs arrive in
many splits and these helpers are no-ops; locally (and for genuinely
small hot tables) they buy back the lost parallelism for the price of
one tiny shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fan_out(df: DataFrame, key: str | None = None, target: int | None = None) -> DataFrame:
    """Ensure at least ``target`` (default: cluster parallelism)
    partitions before a CPU-bound per-row stage.

    No-op when the input already has that many partitions — the guard
    makes this safe to leave in operator code at any scale; it only
    fires when the scan produced too few splits to keep the cores busy.
    ``key`` hash-partitions (deterministic placement, and pre-aligns a
    following groupBy on the same key); without it Spark round-robins.
    """
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, F.col(key)) if key else df.repartition(target)
