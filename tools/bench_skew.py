"""Planted-skew A/B benchmark (round-8 judge ask #3): run the
grouped/joined heavy hitters on a uniform native corpus and on its
hot-key variant (tools/gen_skew_corpus.py — one user with ~30% of
events, one token with ~15%+ of document tokens) and record per-query
skewed/uniform wall ratios plus WHICH mechanism absorbed the skew.

Mechanisms, by operator family:

- user-keyed WINDOW ops (tj_markov, tj_sessionize): the hot user's
  whole history lands in ONE window partition — AQE cannot split a
  window partition (correctness: the frame is ordered within the key),
  so the straggler cost appears directly in the ratio. The bounded
  damage at 100 TB: one task processes hot-key-share x data; the
  mitigation if a key exceeds one task's budget is the documented
  two-level pattern (per-(key, day) sub-windows then merge), not
  salting, which cannot preserve intra-key order.
- user-keyed hash AGGREGATES (tj_funnel, tj_retention): map-side
  partial combine bounds the hot key's reduce-side input by the task
  count, not the row count — expected skew-immune.
- token-keyed hash AGGREGATES (tx_heavy_tokens, tx_vocab, tx_tfidf):
  same partial-combine immunity; the hot token's group state is one
  counter per task.
- shingle/band family (dd_minhash_lsh, dd_doc_signatures): a hot token
  densifies SHARED shingles, which grows genuine candidate mass (real
  verify work, not a partitioning artifact) — the run records LSH
  candidate-pair counts on both corpora so a ratio move is attributed
  to candidates/output, and the per-candidate cost (wall per 1k
  candidates) is the skew-invariance that matters.
- AQE skew-join evidence: after the timed reps, each skew-side query
  is executed once through its own QueryExecution and the final
  adaptive plan is scanned for ``skew=true`` markers (AQE splits a
  skewed shuffle-join partition); counts are recorded per query.

Writes BENCH_SKEW.json. Usage:
  python tools/bench_skew.py <uniform_dir> <skew_dir> [mult]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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


sys.path.insert(0, REPO)

QUERIES = [
    # events side (hot user)
    "tj_markov",
    "tj_sessionize",
    "tj_funnel",
    "tj_retention",
    "tj_resample",
    # documents side (hot token)
    "tx_heavy_tokens",
    "tx_vocab",
    "tx_tfidf",
    "dd_doc_signatures",
    "dd_minhash_lsh",
]

MECHANISM = {
    "tj_markov": "user-keyed window: hot key -> one partition, one "
                 "task (AQE cannot split an ordered window partition); "
                 "ratio IS the straggler cost",
    "tj_sessionize": "user-keyed window: same single-partition bound "
                     "as tj_markov",
    "tj_funnel": "user-keyed hash agg chain: map-side partial combine "
                 "bounds hot-key reduce input by task count",
    "tj_retention": "user-keyed hash agg: partial combine, skew-immune",
    "tj_resample": "(user,bucket)-keyed agg: hot user spreads across "
                   "time buckets — composite key defuses the skew",
    "tx_heavy_tokens": "token-keyed hash agg: partial combine, "
                       "skew-immune",
    "tx_vocab": "token-keyed hash agg: partial combine, skew-immune",
    "tx_tfidf": "token df + per-doc tf aggs: partial combine; hot "
                "token is one group",
    "dd_doc_signatures": "digest-keyed agg: hot token does not change "
                         "digest keys",
    "dd_minhash_lsh": "band equi-join: hot token grows SHARED shingles "
                      "-> more genuine candidates; judge per-candidate "
                      "cost, not wall (candidate counts recorded)",
}


def _bench(spark, lookup, sf_dir: str, reps: int = 2) -> dict[str, float]:
    times: dict[str, float] = {}
    for name in QUERIES:
        spec = lookup[name]
        # warm (codegen cache)
        spec.build(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        best = float("inf")
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            spec.build(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)
        gc.collect()
    return times


def _candidates(spark, sf_dir: str) -> int:
    """LSH candidate-pair count for the minhash family on this corpus
    (the real-work denominator for dd_minhash_lsh's ratio)."""
    from tcga_query_project_spark.operators import dedup

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    sh = dedup.shingle_array(docs, "doc_id", "text")
    sig = dedup.minhash_signature_arrays(sh, "doc_id")
    return dedup.lsh_candidates(sig, "doc_id").count()


def _skew_markers(spark, lookup, sf_dir: str) -> dict[str, int]:
    """Execute each query through its own QueryExecution and count
    ``skew=true`` markers in the final adaptive plan (AQE skew-join
    splits engaged)."""
    out: dict[str, int] = {}
    for name in QUERIES:
        df = lookup[name].build(spark, sf_dir)
        df.collect()  # finalize THIS Dataset's adaptive plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        out[name] = plan.count("skew=true")
    return out


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    uni, skw = sys.argv[1], sys.argv[2]
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else None

    from tcga_query_project_spark.catalog import BENCH_ONLY, REGISTRY
    from tcga_query_project_spark.session import get_spark

    lookup = {**BENCH_ONLY, **REGISTRY}
    spark = get_spark("bench_skew", cpus=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")
    ))
    # one warm pass for worker pool + file listing
    lookup["tx_heavy_tokens"].build(spark, uni).count()

    t_uni = _bench(spark, lookup, uni)
    t_skw = _bench(spark, lookup, skw)
    cand_uni = _candidates(spark, uni)
    cand_skw = _candidates(spark, skw)
    markers = _skew_markers(spark, lookup, skw)

    queries = {}
    for n in QUERIES:
        r = round(t_skw[n] / t_uni[n], 3) if t_uni[n] > 0 else None
        queries[n] = {
            "uniform_sec": t_uni[n],
            "skewed_sec": t_skw[n],
            "ratio": r,
            "aqe_skew_splits": markers[n],
            "mechanism": MECHANISM[n],
        }
    # per-candidate cost for the minhash row — the skew-invariant metric
    mh = queries["dd_minhash_lsh"]
    mh["candidates_uniform"] = cand_uni
    mh["candidates_skewed"] = cand_skw
    if cand_uni and cand_skw:
        pc_u = t_uni["dd_minhash_lsh"] / cand_uni * 1000
        pc_s = t_skw["dd_minhash_lsh"] / cand_skw * 1000
        mh["sec_per_1k_candidates_uniform"] = round(pc_u, 4)
        mh["sec_per_1k_candidates_skewed"] = round(pc_s, 4)

    out = {
        "git_sha": _git_sha(),
        "uniform_dir": uni,
        "skew_dir": skw,
        "mult_of_sf01": mult,
        "hot_keys": "user 1 ~30% of events; token w0 ~15%+ of tokens "
                    "(gen_skew_corpus.py defaults)",
        "queries": queries,
        "note": "ratio = skewed/uniform best-of-2 wall at equal row "
                "counts; window ops carry the straggler cost openly "
                "(AQE cannot split ordered window partitions), hash "
                "aggs are partial-combine immune, minhash is judged "
                "per candidate",
    }
    with open(os.path.join(REPO, "BENCH_SKEW.json"), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps(out, indent=1, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
