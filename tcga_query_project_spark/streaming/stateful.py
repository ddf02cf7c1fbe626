"""Custom stateful streaming operators (SURVEY.md §2.10 north-star:
``applyInPandasWithState`` for semantics the built-in windowed aggs
can't express).

The reference is batch-only; this is the streaming-scale extension
point: arbitrary per-key state machines (running cohort statistics,
sessionized KM inputs, dedup-seen sets) maintained incrementally by
Structured Streaming's state store, with Arrow-batched Python kernels.

Scale design: state is partitioned by the grouping key across the
cluster (one state-store shard per shuffle partition), checkpointed to
the streaming checkpoint location; Python sees one key-group at a time
as an iterator of Arrow batches, so executor memory stays bounded no
matter how many keys or how long the stream runs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def _update_running(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, sum) per key across micro-batches; emit the
    updated running totals once per batch the key appears in."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"key": [key[0]], "n_events": [n], "total_value": [total]})


def running_totals(stream: DataFrame, key: str, value: str) -> DataFrame:
    """Incrementally-maintained per-key running totals over an unbounded
    stream — the custom-stateful analogue of ``groupBy(key).agg``:
    unlike a streaming aggregation, the state transition is arbitrary
    Python, so the same harness hosts CUSUM detectors, incremental KM
    at-risk tables, or seen-set dedup.

    Emits one row per (key, micro-batch-with-activity) in update mode;
    the latest row per key is the current total.
    """
    renamed = stream.select(
        stream[key].alias("key").cast("long"), stream[value].alias("value")
    )
    return renamed.groupBy("key").applyInPandasWithState(
        _update_running,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
