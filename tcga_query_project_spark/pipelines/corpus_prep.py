"""Training-data corpus preparation pipeline (north-star §2.10
end-to-end): exact dedup → fused per-document features → quality +
language filters.

The composed form a 100 TB ingest actually runs: ONE content shuffle
(the dedup window on normalized text — unavoidable for content dedup),
then every text feature (token stats, stopword ratio, quality score,
language ID) derived from a single materialized token array in one
projection — no joins between feature branches, no re-tokenization per
feature (each standalone operator in operators/text.py tokenizes its
own input; composing them by join would tokenize four times and shuffle
three).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tcga_query_project_spark.functions.scalar import split_label
from tcga_query_project_spark.operators.dedup import normalized_text
from tcga_query_project_spark.operators.partitioning import fan_out
from tcga_query_project_spark.operators.text import LANG_MARKERS, STOPWORDS, tokens


def corpus_clean(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.4,
    langs: tuple[str, ...] = ("en",),
) -> DataFrame:
    """Cleaned corpus with per-document features.

    Stages: (1) first-arrival-wins exact dedup on normalized content —
    ``row_number`` over the content key, min id kept; (2) one fused
    projection computing n_tokens / ttr / stopword_ratio /
    quality_score / pred_lang from a token array materialized ONCE
    (array-lambda inputs must be pre-materialized — an inlined
    tokenizer re-runs per element); (3) declarative quality/language
    filters, which Catalyst pushes against the feature projection.
    """
    w = Window.partitionBy("_key").orderBy(F.col(id_col).asc())
    kept = (
        fan_out(docs, id_col)
        .select(F.col(id_col), F.col(text_col), normalized_text(F.col(text_col)).alias("_key"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, text_col)
    )
    with_toks = kept.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    )
    toks = F.col("_toks")
    n = F.size(toks).cast("double")
    stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("double")
    dtoks = F.array_distinct(toks)
    ttr = F.size(dtoks).cast("double") / n
    stop_ratio = stop / n
    length_ok = F.when((n >= 10) & (n <= 1000), 1.0).otherwise(0.0)
    quality = F.round(
        0.4 * length_ok + 0.3 * F.least(stop_ratio * 4.0, F.lit(1.0)) + 0.3 * ttr, 6
    )
    pred = F.lit("und")
    for lang, markers in reversed(LANG_MARKERS):
        hit = F.size(F.filter(dtoks, lambda t: t.isin(*markers))) > 0
        pred = F.when(hit, F.lit(lang)).otherwise(pred)
    feats = with_toks.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(ttr, 6).alias("ttr"),
        quality.alias("quality_score"),
        pred.alias("pred_lang"),
        # deterministic hash split (stable across runs/engines/order) —
        # the downstream trainer's train/val/test membership
        split_label(F.col(id_col)).alias("split"),
    )
    return feats.filter(
        (F.col("quality_score") >= min_quality) & F.col("pred_lang").isin(*langs)
    )
