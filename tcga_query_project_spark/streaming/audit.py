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

Exactly-once accounting comes from the streaming checkpoint: on
restart a re-delivered batch id re-audits deterministically and
rewrites the same routing decision.

At 100 TB/day: the audit is one map-side-partial aggregation per
micro-batch (however many checks), so the gate adds a scan — not a
shuffle — to the ingest path; the report is check-count-sized rows per
batch.
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
    the routed batches as appended parquet; ``report_path`` holds
    ``(batch_id, check, column, metric, threshold, passed)`` rows.
    """

    def _gate(batch_df: DataFrame, batch_id: int) -> None:
        report = qa.audit(batch_df, checks)
        ok = qa.audit_passed(report)
        report.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(report_path)
        target = accept_path if ok else quarantine_path
        batch_df.write.mode("append").parquet(target)

    writer = (
        stream.writeStream.foreachBatch(_gate)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_path)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
