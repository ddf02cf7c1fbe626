"""Streaming corpus preparation (north-star §2.10: the corpus-prep
pipeline's unbounded-ingest form).

Batch corpus prep (pipelines/corpus_prep.corpus_clean) sees the whole
corpus — its dedup keeps the minimum doc id per content key via a
window. A stream cannot rank within a key it hasn't finished seeing, so
the streaming form composes:

1. watermark-bounded FIRST-ARRIVAL dedup on the normalized content key
   (streaming/dedup.exact_dedup_stream — one state entry per content
   hash until the watermark passes);
2. the identical fused per-document feature projection
   (operators/text.doc_metrics — stateless, append-safe);
3. the identical declarative quality/language filters.

Keeper choice is the only semantic difference (first arrival vs min
id); every retained document's features and the filter decisions are
byte-identical to batch, so stream output == batch output as a multiset
of feature rows (asserted in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tcga_query_project_spark.functions.scalar import split_label
from tcga_query_project_spark.operators.dedup import normalized_text
from tcga_query_project_spark.operators.text import doc_metrics
from tcga_query_project_spark.streaming.dedup import exact_dedup_stream


def corpus_clean_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ingest_ts",
    delay: str = "1 hour",
    min_quality: float = 0.4,
    langs: tuple[str, ...] = ("en",),
) -> DataFrame:
    """Cleaned-corpus stream with per-document features; append mode,
    bounded state (dedup hashes inside the watermark only). Works on a
    batch DataFrame too (dedup degrades to whole-input dropDuplicates),
    preserving the engine's batch/stream symmetry contract.
    """
    # md5 of the normalized content as the dedup key: the dedup state
    # store then holds a 32-char digest per document instead of the full
    # text (same keying as the batch pipeline; collisions ~2^-64).
    keyed = docs.withColumn("_key", F.md5(normalized_text(F.col(text_col))))
    deduped = exact_dedup_stream(keyed, ["_key"], ts_col, delay)
    feats = doc_metrics(deduped, id_col, text_col).withColumn(
        # same deterministic train/val/test membership as the batch
        # pipeline (hash of the id — stream/batch schema parity)
        "split",
        split_label(F.col(id_col)),
    )
    return feats.filter(
        (F.col("quality_score") >= min_quality)
        & F.col("pred_lang").isin(*langs)
    )
