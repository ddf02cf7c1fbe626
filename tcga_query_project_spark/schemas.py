"""Fixed schemas.

The reference manipulates schemaless R data.frames and a dense
genes × samples matrix (`SummarizedExperiment`; reference
`vital_status_DESeq.R:67`, `surv_analysis_median_exp.R:45`). The engine
replaces that with a declared long/tidy star schema (SURVEY.md §1.4):
a tall `expression` fact plus `genes` / `samples` dimensions. Wide
matrices appear only at the presentation edge via pivot.

Also records the driver-provided testdata table schemas (FIXTURES.md §B)
so readers can assert on them.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- TCGA star schema (SURVEY.md §1.4) -----------------------------------

# fact: one row per (gene, sample); replaces assay(prep, "unstranded")
# (reference surv_analysis_median_exp.R:45, drug_km_median_exp.R:57)
EXPRESSION = T.StructType(
    [
        T.StructField("gene_id", T.StringType(), False),
        T.StructField("barcode", T.StringType(), False),
        T.StructField("count", T.LongType(), True),
    ]
)

# dimension: rowRanges(prep) fields actually used
# (reference vital_status_DESeq.R:102-103)
GENES = T.StructType(
    [
        T.StructField("gene_id", T.StringType(), False),
        T.StructField("gene_name", T.StringType(), True),
    ]
)

# dimension: colData(prep) clinical columns the scripts touch
# (reference vital_status_DESeq.R:27-30, surv_analysis_median_exp.R:107-113,
#  drug_km_median_exp.R:34-35; nested treatments drug_km_median_exp.R:35-53)
TREATMENT = T.StructType(
    [
        T.StructField("submitter_id", T.StringType(), True),
        T.StructField("treatment_type", T.StringType(), True),
        T.StructField("therapeutic_agents", T.StringType(), True),
    ]
)

SAMPLES = T.StructType(
    [
        T.StructField("barcode", T.StringType(), False),
        T.StructField("submitter_id", T.StringType(), True),
        T.StructField("short_letter_code", T.StringType(), True),
        T.StructField("vital_status", T.StringType(), True),
        # string-typed numerals on purpose: the reference casts them
        # (surv_analysis_median_exp.R:109) and so do we (F8).
        T.StructField("days_to_death", T.StringType(), True),
        T.StructField("paper_days_to_last_followup", T.StringType(), True),
        T.StructField("ajcc_pathologic_stage", T.StringType(), True),
        T.StructField("paper_brca_subtype_pam50", T.StringType(), True),
        T.StructField("sample_type", T.StringType(), True),
        T.StructField("treatments", T.ArrayType(TREATMENT), True),
    ]
)

# Ordered factors (reference fixes level order explicitly, e.g.
# vital_status_DESeq.R:30, BRCA_path_stage_DESeq.R:47). Spark has no
# ordered-categorical type; level order is carried as explicit rank maps
# consumed by when()-chains / sort keys. SURVEY.md §1.2 "hard parts" #3.
LEVEL_ORDERS: dict[str, list[str]] = {
    "short_letter_code": ["NT", "TP"],  # lettercode_DESeq.R:28
    "vital_status": ["Alive", "Dead"],  # vital_status_DESeq.R:30
    "ajcc_pathologic_stage": [  # BRCA_path_stage_DESeq.R:47
        "Stage_0",
        "Stage_I",
        "Stage_II",
        "Stage_III",
        "Stage_IV",
    ],
    "paper_brca_subtype_pam50": [  # BRCA_subtype_DESeq.R:43
        "Normal",
        "Basal",
        "Her2",
        "LumA",
        "LumB",
    ],
}

# --- driver testdata tables (FIXTURES.md §B) ------------------------------

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
