"""Streaming ingest gate: audit every micro-batch, route it whole.

Composes the single-pass expectation audit
(``operators/quality_audit``) with Structured Streaming's
``foreachBatch``: each micro-batch is audited in one aggregation job;
if every check passes the batch lands in the accept sink, otherwise it
lands — complete, untouched — in quarantine, and either way the
check-level report appends to an audit log with the batch id. Batches
route WHOLE (not row-filtered): an expectation violation signals an
upstream fault (schema drift, a broken producer, an empty extract),
and shipping the "clean-looking" remainder of a faulty batch is how
silent corruption enters a corpus — quarantine the unit of delivery,
repair upstream, replay.

Replay safety: ``foreachBatch`` is at-least-once — a crash between the
report write and the data write re-delivers the batch on restart — so
every sink partitions by ``batch_id`` and writes with DYNAMIC
partition overwrite: a replayed batch re-audits deterministically and
REPLACES its own partition instead of appending duplicates. (Plain
append here would double-count documents and check rows; this is the
standard idempotent-foreachBatch recipe for non-transactional sinks.)

At 100 TB/day: one aggregation job per micro-batch (the check-count-
sized report collects to the driver once and serves both the gate
decision and the log write — the batch is never re-scanned for the
verdict), plus the routing write itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tcga_query_project_spark.operators import quality_audit as qa


def audited_ingest(
    stream: DataFrame,
    checks,
    accept_path: str,
    quarantine_path: str,
    report_path: str,
    checkpoint_path: str,
    trigger_available_now: bool = True,
):
    """Start the gated ingest; returns the StreamingQuery (caller owns
    its lifecycle). Layout: ``accept_path``/``quarantine_path`` hold
    the routed batches as parquet partitioned by ``batch_id``;
    ``report_path`` holds ``(check, column, metric, threshold, passed,
    batch_id)`` rows, same partitioning.
    """

    def _overwrite_own_partition(df: DataFrame, path: str) -> None:
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(path)
        )

    def _gate(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # one aggregation job: the report is check-count-sized, so
        # collecting it gives the gate verdict for free instead of
        # re-running the aggregation (and re-scanning the batch) for
        # audit_passed and again for the report write
        audit_df = qa.audit(batch_df, checks)
        rows = audit_df.collect()
        ok = all(r["passed"] for r in rows)
        # explicit schema: on a degenerate batch (e.g. empty extract
        # audited with only avg/min/max checks) every `metric` is None
        # and Row-based inference would raise instead of quarantining
        report = spark.createDataFrame(rows, audit_df.schema).withColumn(
            "batch_id", F.lit(batch_id)
        )
        _overwrite_own_partition(report, report_path)
        target = accept_path if ok else quarantine_path
        _overwrite_own_partition(
            batch_df.withColumn("batch_id", F.lit(batch_id)), target
        )

    writer = (
        stream.writeStream.foreachBatch(_gate)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_path)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def drift_monitor(
    stream: DataFrame,
    reference: DataFrame,
    *,
    numeric: dict | None = None,
    categorical: list | None = None,
    report_path: str,
    checkpoint_path: str,
    threshold: float = 0.2,
    trigger_available_now: bool = True,
):
    """Streaming distribution-drift monitor: PSI of every micro-batch
    against a STATIC reference window (the data the filters/weights
    were tuned on — see :func:`...operators.quality_audit.psi_drift`),
    appended per batch to a drift log. The alerting layer tails the
    log for ``drifted = true`` rows; the pipeline itself keeps
    flowing — drift is a re-tune signal, not a data fault, which is
    why this monitor OBSERVES rather than gates (contrast
    :func:`audited_ingest`, where a failed expectation quarantines
    the batch).

    The reference side is re-binned per micro-batch. Bin counts are
    feature x bin sized, so the repeated cost is one scan of the
    (usually dimension-sized, cached) reference — callers with a big
    reference should pass ``reference.persist()`` or pre-aggregate.

    Same idempotent-foreachBatch recipe as :func:`audited_ingest`:
    the report partitions by ``batch_id`` with dynamic overwrite, so
    an at-least-once replay replaces its own partition.

    Returns the StreamingQuery; report rows are ``(feature, psi,
    n_bins, drifted, batch_id)``.
    """

    def _check(batch_df: DataFrame, batch_id: int) -> None:
        report = qa.psi_drift(
            reference,
            batch_df,
            numeric=numeric,
            categorical=categorical,
            threshold=threshold,
        ).withColumn("batch_id", F.lit(batch_id))
        (
            report.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(report_path)
        )

    writer = (
        stream.writeStream.foreachBatch(_check)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_path)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
