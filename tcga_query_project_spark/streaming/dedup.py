"""Streaming deduplication (north-star §2.10: the dedup operators'
unbounded-stream form).

Batch dedup (operators/dedup.py) sees the whole corpus; a stream
cannot. ``dropDuplicatesWithinWatermark`` keeps one state entry per key
only until the watermark passes its event time, so duplicate arrivals
inside the lateness bound collapse while state stays bounded — the only
sane contract for an infinite stream at ingest scale (exact global
dedup over an unbounded stream would need unbounded state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def exact_dedup_stream(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """First-arrival-wins exact dedup on ``keys``.

    Streaming input: watermark on ``ts_col`` bounds the seen-keys state
    (a duplicate arriving later than ``delay`` after its first copy may
    pass — the documented tradeoff). Batch input: plain
    ``dropDuplicates`` — same keys, whole-input scope — so one call site
    serves both, mirroring streaming/windows.py's batch/stream symmetry.
    """
    if df.isStreaming:
        return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)
