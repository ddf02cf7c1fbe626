"""Structured Streaming throughput benchmark — rows/sec through the
engine's streaming operators, recorded into STREAM_BENCH.json.

The batch-form BENCH entries (st_session_sliding, dd_band_firstseen,
tj_scd2_lookup) pin the OPERATOR cost; this harness pins the
STREAMING-RUNTIME cost on top: micro-batch scheduling, watermark
advancement, and state-store traffic, which no batch query exercises.

Method: the sf0.1 events table (100k rows) / documents table (5k docs)
is re-written into N parquet files; each pipeline runs a file-source
stream with ``maxFilesPerTrigger=1`` under ``trigger(availableNow)``
to a noop sink, so every run processes the full input as N genuine
micro-batches (state carried across triggers, watermark advancing
between them — the regime a 24/7 ingest job lives in) and terminates
deterministically. Reported: wall seconds for the drained run and
input rows/sec. Rates are single-node local[CPUS] figures for
ROUND-OVER-ROUND comparison, not absolute cluster throughput.

Pipelines:
- tumbling_agg: per-minute/event_type counts+sums (windowed agg state)
- session_agg: per-user session windows (merging window state)
- exact_dedup: dropDuplicatesWithinWatermark on event_id
- running_totals_tws: transformWithState Python stateful totals
- scd2_enrich: stream-static point-in-time dimension join
- neardup_bands: two chained stateful ops (band dedup -> windowed
  count) over the documents stream
- windowed_psi (+_10x): event-time windowed PSI drift monitor — one
  watermarked windowed bin-count agg, then foreachBatch writes the
  per-window report (the report write is per-trigger fixed cost, so
  the _10x matched-batch row is the amortized figure)

Usage: python tools/bench_streaming.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _git_sha() -> str:
    """Embed the snapshot SHA in the record (round-10 verdict item 2:
    every round record must carry the commit it was measured at)."""
    import subprocess

    try:
        return subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=REPO,
            capture_output=True, text=True, check=True,
        ).stdout.strip()
    except Exception:
        return "unknown"

# transformWithState's state-server protocol needs google.protobuf in
# the driver and every Python worker — same shim wiring as
# tests/conftest.py (must precede SparkSession creation).
_VENDOR = os.path.join(REPO, "tests", "_vendor")
try:
    import google.protobuf  # noqa: F401
except ImportError:
    if os.path.isdir(
        os.environ.get(
            "SPARK_GRAFT_PROTOBUF_HOME",
            "/usr/lib/google-cloud-sdk/platform/google_appengine/google",
        )
    ):
        sys.path.insert(0, _VENDOR)
        os.environ["PYTHONPATH"] = os.pathsep.join(
            p for p in (_VENDOR, os.environ.get("PYTHONPATH")) if p
        )

N_EVENT_FILES = 16
N_DOC_FILES = 8


def _state_peak(q) -> dict:
    """Peak state-store footprint across the run's micro-batches, read
    from the query's progress telemetry (round-10 verdict item 6): per
    progress update, SUM the stateOperators' row/byte figures (a
    pipeline may carry several stateful operators), then take the MAX
    over updates. RocksDB reports its footprint in customMetrics
    instead of memoryUsedBytes — fall back to it when larger."""
    rows_peak = bytes_peak = 0
    for p in q.recentProgress or []:
        ops = (p or {}).get("stateOperators") or []
        rows = sum(int(o.get("numRowsTotal") or 0) for o in ops)
        byts = 0
        for o in ops:
            b = int(o.get("memoryUsedBytes") or 0)
            cm = o.get("customMetrics") or {}
            b = max(b, int(cm.get("rocksdbTotalMemoryUsageBytes") or 0))
            byts += b
        rows_peak = max(rows_peak, rows)
        bytes_peak = max(bytes_peak, byts)
    return {"state_rows_peak": rows_peak, "state_bytes_peak": bytes_peak}


def _drain(stream_df, name: str, mode: str = "append") -> tuple[float, dict]:
    t0 = time.monotonic()
    q = (
        stream_df.writeStream.format("noop")
        .option("checkpointLocation", tempfile.mkdtemp(prefix=f"ck_{name}_"))
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    secs = time.monotonic() - t0
    return secs, _state_peak(q)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "STREAM_BENCH.json"
    )
    from pyspark.sql import functions as F

    from tcga_query_project_spark.session import get_spark
    from tcga_query_project_spark.sources.io import read_events
    from tcga_query_project_spark.streaming import (
        dedup as sdedup,
        joins as sjoins,
        neardup as sneardup,
        stateful,
        windows as swin,
    )

    # state-store shards = shuffle partitions, and each shard pays a
    # per-micro-batch checkpoint write: at 100k-row batches the default
    # 32 shards are pure fixed cost (32 shards x 2 stateful ops x N
    # batches of delta files). 8 is the tuned figure for this input
    # size; a real job sizes shards to its state volume, not its cores.
    # _state_peak reads q.recentProgress, which Spark caps at
    # spark.sql.streaming.numRecentProgressUpdates (default 100): a
    # drain with more micro-batches than the cap would silently
    # under-report the peaks (round-11 ADVICE). Current configs top
    # out at N_EVENT_FILES (+1 terminal) updates; 1000 leaves 10x
    # headroom for future 10x-file variants.
    spark = get_spark(
        "stream-bench",
        shuffle_partitions=8,
        extra_conf={"spark.sql.streaming.numRecentProgressUpdates": "1000"},
    )
    work = tempfile.mkdtemp(prefix="stream_bench_")
    ev_dir = os.path.join(work, "events")
    doc_dir = os.path.join(work, "docs")
    events = read_events(spark, sf_dir)
    # one file per micro-batch; repartition by nothing specific — the
    # file split IS the trigger boundary
    # TIME-ORDERED micro-batches (round-8 review): a random file split
    # puts the whole time range in EVERY file, so after batch 1 the
    # watermark sits 10 minutes behind the global max and batches 2..N
    # arrive almost entirely below it — the watermarked operators then
    # measure late-row DROP throughput, not state traffic. Range-
    # partitioning by event time makes each file a consecutive time
    # slice (how a real ingest source delivers), the watermark advances
    # between batches, and state sees the whole input. Part-file names
    # are range-ordered, which is the file source's processing order.
    events.repartitionByRange(N_EVENT_FILES, "ts").write.parquet(ev_dir)
    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        # documents carry no timestamp; synthesize an arrival time so
        # the watermark machinery runs (1 doc/second)
        .withColumn(
            "ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id"))
        )
    )
    docs.repartitionByRange(N_DOC_FILES, "ts").write.parquet(doc_dir)
    n_events = events.count()
    n_docs = docs.count()
    # a 10x documents corpus whose per-micro-batch row count MATCHES the
    # event pipelines' (6250 vs 625 at sf0.1): the round-7 neardup_bands
    # outlier (409 rows/s) was per-micro-batch FIXED cost — two stateful
    # commits + trigger overhead, ~0.6 s/batch at 8 shards — divided by
    # tiny batches, not operator cost. Replicas get distinct ids and an
    # interleaved replica token every 3rd word (same construction as
    # tools/gen_scale_sf.py interleave mode) so band signatures differ
    # across replicas and state traffic stays realistic.
    doc10_dir = os.path.join(work, "docs10")
    docs10 = (
        docs.select(
            F.explode(F.sequence(F.lit(0), F.lit(9))).alias("_r"),
            "doc_id", "text", "ts",
        )
        .select(
            (F.col("doc_id") + F.col("_r") * 10_000_000).alias("doc_id"),
            F.when(F.col("_r") == 0, F.col("text")).otherwise(
                F.regexp_replace(
                    F.col("text"), F.lit(r"(\S+ \S+ \S+) "),
                    F.concat(
                        F.lit("$1 rep"),
                        F.col("_r").cast("string"),
                        F.lit(" "),
                    ),
                )
            ).alias("text"),
            # dense arrival clock (1 doc/second across the WHOLE 10x
            # corpus): replica r follows replica r-1 contiguously. The
            # first cut reused the key offset (r * 10^7 seconds ≈ 115
            # days between replicas), which combined with the random
            # file split to land most rows below the watermark.
            F.timestamp_seconds(
                F.lit(1_700_000_000)
                + F.col("doc_id") + F.col("_r") * 5_000
            ).alias("ts"),
        )
    )
    docs10.repartitionByRange(N_DOC_FILES, "ts").write.parquet(doc10_dir)
    n_docs10 = docs10.count()

    # a 10x events replica with the SAME user base (more history per
    # user, not more users): the round-9 profile showed the Python
    # stateful pipelines are bounded by per-(key, micro-batch)
    # invocations (1500 users x 16 triggers), a cost independent of
    # batch size — so their amortized throughput needs a matched-batch
    # figure exactly like neardup_bands_10x. Replicas keep user_id
    # (state/key count unchanged), offset event_id for uniqueness, and
    # get a dense per-replica time shift so range partitioning still
    # yields 16 consecutive slices.
    ev10_dir = os.path.join(work, "events10")
    span_us = events.agg(
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("d")
    ).collect()[0]["d"] or 0
    ev10 = events.select(
        F.explode(F.sequence(F.lit(0), F.lit(9))).alias("_r"),
        *[c for c in events.columns],
    ).select(
        (F.col("event_id") + F.col("_r") * 10_000_000).alias("event_id"),
        F.timestamp_micros(
            F.unix_micros(F.col("ts"))
            + F.col("_r").cast("long") * (span_us + 1_000_000)
        ).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    ev10.repartitionByRange(N_EVENT_FILES, "ts").write.parquet(ev10_dir)
    n_events10 = ev10.count()

    ev_schema = spark.read.parquet(ev_dir).schema
    doc_schema = spark.read.parquet(doc_dir).schema

    def ev_stream():
        return (
            spark.readStream.schema(ev_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(ev_dir)
        )

    def doc_stream():
        return (
            spark.readStream.schema(doc_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(doc_dir)
        )

    doc10_schema = spark.read.parquet(doc10_dir).schema

    def doc10_stream():
        return (
            spark.readStream.schema(doc10_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(doc10_dir)
        )

    ev10_schema = spark.read.parquet(ev10_dir).schema

    def ev10_stream():
        return (
            spark.readStream.schema(ev10_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(ev10_dir)
        )

    # a small SCD2 user dimension: two versions per user over the
    # event time span (dimension-sized: |users| << |events|)
    users = events.select("user_id").distinct()
    span = events.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    mid = span["lo"] + (span["hi"] - span["lo"]) / 2
    dim = users.select(
        "user_id",
        F.lit(span["lo"]).alias("valid_from"),
        F.lit(mid).alias("valid_to"),
        F.concat(F.lit("tier_a_"), F.col("user_id")).alias("tier"),
    ).unionByName(
        users.select(
            "user_id",
            F.lit(mid).alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
            F.concat(F.lit("tier_b_"), F.col("user_id")).alias("tier"),
        )
    )

    pipelines = {
        "tumbling_agg": (
            lambda: swin.tumbling_agg(
                ev_stream(), "ts", "1 minute", ["event_type"],
                [F.count(F.lit(1)).alias("n"), F.sum("value").alias("v")],
            ),
            n_events,
        ),
        "session_agg": (
            lambda: swin.session_agg(
                ev_stream(), "ts", "5 minutes", ["user_id"],
                [F.count(F.lit(1)).alias("n")],
            ),
            n_events,
        ),
        "exact_dedup": (
            lambda: sdedup.exact_dedup_stream(
                ev_stream(), ["event_id"], "ts", "10 minutes"
            ),
            n_events,
        ),
        "running_totals_tws": (
            # no outer watermark: the operator defines its own on the
            # renamed event-time column (redefining is an error)
            lambda: stateful.running_totals_tws(
                ev_stream(), key="user_id", value="value", ts="ts",
            ),
            n_events,
        ),
        "scd2_enrich": (
            lambda: sjoins.enrich_with_scd2(
                ev_stream(), dim, "user_id", "ts"
            ),
            n_events,
        ),
        "transition_pairs": (
            # per-user last-event state; emits newly-closed Markov
            # adjacencies per micro-batch (append mode)
            lambda: stateful.transition_pairs(
                ev_stream(), "user_id", "ts", "event_type", "event_id"
            ),
            n_events,
        ),
        # matched-batch figures (round-9 profile): the Python stateful
        # pipelines pay ~0.3 ms per (key, micro-batch) invocation — a
        # DO-NOTHING applyInPandasWithState kernel measures 10.2s on
        # the 100k/16-batch input vs a 3.0s JVM stateless floor — so
        # tiny batches measure the invocation boundary, not the
        # operator. Same user base, 10x history: invocation count is
        # UNCHANGED while rows grow 10x.
        "transition_pairs_10x": (
            lambda: stateful.transition_pairs(
                ev10_stream(), "user_id", "ts", "event_type", "event_id"
            ),
            n_events10,
        ),
        "running_totals_tws_10x": (
            lambda: stateful.running_totals_tws(
                ev10_stream(), key="user_id", value="value", ts="ts",
            ),
            n_events10,
        ),
        "neardup_bands": (
            lambda: sneardup.near_dup_dedup_stream(
                doc_stream(), "doc_id", "text", "ts", "10 minutes"
            ),
            n_docs,
        ),
        # matched-batch-size figure: same pipeline, 10x corpus, so each
        # micro-batch carries as many docs as the event pipelines carry
        # events — the operator's amortized throughput, vs the tiny-batch
        # row above which is dominated by per-trigger fixed cost
        "neardup_bands_10x": (
            lambda: sneardup.near_dup_dedup_stream(
                doc10_stream(), "doc_id", "text", "ts", "10 minutes"
            ),
            n_docs10,
        ),
        # round-11 (verdict item 6): 10x points for the four JVM
        # pipelines that lacked them. Same matched-batch rationale —
        # each micro-batch carries 10x rows, isolating operator
        # throughput from per-trigger fixed cost. State growth differs
        # by design and the recorded state_rows/bytes_peak columns show
        # it: tumbling/session/scd2 keep their key space (same
        # event_types/users; 10x history per key), exact_dedup's state
        # grows with distinct event_ids (10x keys — dedup state is
        # inherently row-shaped until the watermark expires it).
        "tumbling_agg_10x": (
            lambda: swin.tumbling_agg(
                ev10_stream(), "ts", "1 minute", ["event_type"],
                [F.count(F.lit(1)).alias("n"), F.sum("value").alias("v")],
            ),
            n_events10,
        ),
        "session_agg_10x": (
            lambda: swin.session_agg(
                ev10_stream(), "ts", "5 minutes", ["user_id"],
                [F.count(F.lit(1)).alias("n")],
            ),
            n_events10,
        ),
        "exact_dedup_10x": (
            lambda: sdedup.exact_dedup_stream(
                ev10_stream(), ["event_id"], "ts", "10 minutes"
            ),
            n_events10,
        ),
        "scd2_enrich_10x": (
            # the tier_b dimension version is open-ended (valid_to
            # NULL), so it covers the replicas' shifted time range —
            # the join stays point-in-time correct at 10x
            lambda: sjoins.enrich_with_scd2(
                ev10_stream(), dim, "user_id", "ts"
            ),
            n_events10,
        ),
    }

    # transformWithState needs the RocksDB provider (one column family
    # per named state variable; the HDFS-backed store has exactly one)
    # and emits running rows, i.e. update mode
    _tws = {
        "mode": "update",
        "conf": {
            "spark.sql.streaming.stateStore.providerClass": (
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider"
            )
        },
    }
    special = {"running_totals_tws": _tws, "running_totals_tws_10x": _tws}

    results: dict[str, dict] = {}
    for name, (build, rows) in pipelines.items():
        extra = special.get(name, {})
        mode = extra.get("mode", "append")
        prev: dict[str, str | None] = {}
        for k, val in extra.get("conf", {}).items():
            prev[k] = spark.conf.get(k, None)
            spark.conf.set(k, val)
        try:
            _drain(build(), name, mode)  # warm: codegen + state-store init
            runs = [_drain(build(), name, mode) for _ in range(2)]
            secs, state = min(runs, key=lambda r: r[0])
            results[name] = {
                "rows_in": rows,
                "sec": round(secs, 3),
                "rows_per_sec": int(rows / secs),
                **state,
            }
        except Exception as e:  # record, don't abort the whole bench
            results[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
        finally:
            for k, val in prev.items():
                if val is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, val)
        print(name, results[name])

    # windowed-PSI drift monitor (round-10, verdict item 6): owns its
    # query (foreachBatch writes the report), so it cannot ride _drain's
    # noop sink — timed through its own start/awaitTermination. Config
    # matches the driver-attested batch form qa_windowed_psi (value
    # edges 0/50/200, event_type categorical, 1-day windows); the
    # baseline is the full events table binned once up front.
    from tcga_query_project_spark.streaming import quality as squality

    psi_feats = {
        "numeric": {"value": [0.0, 50.0, 200.0]},
        "categorical": ["event_type"],
    }
    baseline_ev = spark.read.parquet(ev_dir)

    def _run_psi(stream_fn) -> tuple[float, dict]:
        run_dir = tempfile.mkdtemp(prefix="psi_bench_")
        t0 = time.monotonic()
        q = squality.start_windowed_psi(
            stream_fn(),
            "ts",
            baseline_ev,
            os.path.join(run_dir, "report"),
            os.path.join(run_dir, "ckpt"),
            window="1 day",
            watermark="30 minutes",
            **psi_feats,
        )
        q.awaitTermination()
        secs = time.monotonic() - t0
        state = _state_peak(q)
        shutil.rmtree(run_dir, ignore_errors=True)
        return secs, state

    for name, (stream_fn, rows) in {
        "windowed_psi": (ev_stream, n_events),
        "windowed_psi_10x": (ev10_stream, n_events10),
    }.items():
        try:
            _run_psi(stream_fn)  # warm
            runs = [_run_psi(stream_fn) for _ in range(2)]
            secs, state = min(runs, key=lambda r: r[0])
            results[name] = {
                "rows_in": rows,
                "sec": round(secs, 3),
                "rows_per_sec": int(rows / secs),
                **state,
            }
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(name, results[name])

    out = {
        "git_sha": _git_sha(),
        "sf_dir": sf_dir,
        "n_event_files": N_EVENT_FILES,
        "n_doc_files": N_DOC_FILES,
        "note": (
            "availableNow + maxFilesPerTrigger=1: full input as N "
            "micro-batches to a noop sink; best-of-2 after a warm run; "
            "single-node round-over-round figures. Since round 8 the "
            "input files are TIME-ORDERED slices (repartitionByRange "
            "on event time) so the watermark advances between batches "
            "and the stateful operators see the whole input — earlier "
            "rounds' random file split dropped most post-batch-1 rows "
            "as late, so pre-round-8 figures measured a lighter state "
            "load and are not directly comparable. Since round 11 "
            "every pipeline records state_rows_peak / state_bytes_peak "
            "(max over micro-batches of the progress telemetry's "
            "stateOperators totals; RocksDB reports via "
            "rocksdbTotalMemoryUsageBytes) and every JVM pipeline has "
            "a matched-batch _10x row. Peaks are read from "
            "recentProgress with numRecentProgressUpdates raised to "
            "1000 (default 100) — a drain with more micro-batches than "
            "that cap would silently under-report the peaks"
        ),
        "profile": (
            "round-9 decomposition on the 100k/16-batch input at 8 "
            "shards: JVM stateless floor 3.0s; DO-NOTHING "
            "applyInPandasWithState kernel 10.2s (the per-(key, "
            "micro-batch) Python invocation boundary - 1500 users x 16 "
            "triggers); +state get/update 10.8s (state-store traffic "
            "is ~5% of wall, NOT the bottleneck); RocksDB provider "
            "13.3s (SLOWER at this state size - per-batch-per-shard "
            "provider commit overhead, worth it only for state that "
            "outgrows memory); transition_pairs full kernel 15.7s. "
            "The invocation boundary is the API's inherent per-call "
            "cost; the _10x matched-batch rows show the amortized "
            "throughput when batches carry 10x rows over the SAME "
            "keys (invocation count unchanged)"
        ),
        "pipelines": results,
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps({k: v.get("rows_per_sec") for k, v in results.items()}))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
