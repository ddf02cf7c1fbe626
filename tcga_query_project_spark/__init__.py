"""tcga_query_project_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference repo
``Matt-Preece/TCGA-query-project`` (six R scripts running TCGA
differential-expression and survival analyses; see SURVEY.md).

Layout
------
- ``session``     — SparkSession builder (local[*], AQE, UTC).
- ``schemas``     — fixed StructTypes for the star schema + testdata.
- ``sources``     — parquet/csv/tsv readers & sinks, checkpoint ladder.
- ``operators``   — relational / stats / survival / nested / dedup /
                    similarity / text operator library (DataFrame in,
                    DataFrame out; built-in functions only in hot paths).
- ``functions``   — scalar expression helpers (significance binning,
                    normal-distribution approximations, portable hashes).
- ``streaming``   — batch/stream-symmetric time-window operators.
- ``plans``       — the reference's three entry-point pipelines composed
                    from the operator library.
- ``catalog``     — the driver-facing query registry: every operator as a
                    named query over the testdata tables plus its DuckDB
                    oracle SQL.
"""

__version__ = "0.1.0"
