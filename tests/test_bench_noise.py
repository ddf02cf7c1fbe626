"""Unit tests for the bench-noise classifier (tools/bench_noise.py) on
synthetic fixtures — the three classes (DRIFT / IMPROVED / floored)
must be mechanically distinguishable, since the per-round regression
gate (`bench.py flagged_regressed`) and the round-end envelope re-pin
both lean on this logic (round-9 judge ask #8)."""

from __future__ import annotations

import importlib.util
import os

_SPEC = importlib.util.spec_from_file_location(
    "bench_noise",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "bench_noise.py",
    ),
)
bench_noise = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(bench_noise)


def _env(**queries):
    """Synthetic BENCH_NOISE envelope: spread_p95 pinned at 1.2 so the
    band math is easy to reason about by hand."""
    return {
        "spread_p95": 1.2,
        "queries": {
            n: {"exec_min": lo, "exec_max": hi}
            for n, (lo, hi) in queries.items()
        },
    }


def _run(**times):
    return {"queries_exec_only": dict(times)}


def test_inside_envelope_is_silent():
    noise = _env(q_big=(1.0, 1.1), q_tiny=(0.05, 0.06))
    res = bench_noise.classify(noise, _run(q_big=1.05, q_tiny=0.055))
    assert res["drift"] == [] and res["improved"] == []
    assert res["floored"] == 0


def test_drift_above_envelope_for_big_query():
    # 2.0s vs max 1.1*1.2=1.32 band, over the 0.3s absolute gate
    noise = _env(q_big=(1.0, 1.1))
    res = bench_noise.classify(noise, _run(q_big=2.0))
    assert [d[0] for d in res["drift"]] == ["q_big"]
    assert res["improved"] == []


def test_improved_below_envelope_for_big_query():
    # 0.5s vs min 1.0/1.2=0.833 band — labeled IMPROVED, not DRIFT
    noise = _env(q_big=(1.0, 1.1))
    res = bench_noise.classify(noise, _run(q_big=0.5))
    assert [d[0] for d in res["improved"]] == ["q_big"]
    assert res["drift"] == []


def test_tiny_query_jitter_is_floored_not_drift():
    # 0.05s -> 0.12s: outside the band but under 0.3s absolute AND
    # under 3x relative (0.12 < 3*0.06) — counted, never labeled
    noise = _env(q_tiny=(0.05, 0.06))
    res = bench_noise.classify(noise, _run(q_tiny=0.12))
    assert res["drift"] == [] and res["improved"] == []
    assert res["floored"] == 1


def test_tiny_query_3x_relative_move_still_flags():
    # the round-8 advisor case: 0.05s -> 0.29s (5.8x) is under the
    # 0.3s floor but over 3x exec_max — must flag as DRIFT
    noise = _env(q_tiny=(0.05, 0.06))
    res = bench_noise.classify(noise, _run(q_tiny=0.29))
    assert [d[0] for d in res["drift"]] == ["q_tiny"]


def test_tiny_query_3x_relative_improvement_flags_improved():
    # mirrored gate below: 0.31 -> 0.05 (6x faster) on a query whose
    # envelope min is above 0.3s — IMPROVED even though t itself is tiny
    noise = _env(q_mid=(0.31, 0.35))
    res = bench_noise.classify(noise, _run(q_mid=0.05))
    assert [d[0] for d in res["improved"]] == ["q_mid"]
    assert res["drift"] == []


def test_query_missing_from_run_is_skipped():
    noise = _env(q_big=(1.0, 1.1), q_gone=(0.5, 0.6))
    res = bench_noise.classify(noise, _run(q_big=1.0))
    assert res["drift"] == [] and res["improved"] == []
    assert res["floored"] == 0


def test_storm_split_attributes_flags_by_probe():
    """bench.py's _split_storms: a regression flag whose noise probe
    spiked >=3x the session median is storm-suspect; a flag with a
    quiet probe stays a real regression; missing/empty probes never
    reclassify."""
    import bench

    probes = {f"q{i}": 0.1 for i in range(20)}
    probes["stormy"] = 0.45  # 4.5x the 0.1 median
    probes["quietbad"] = 0.11
    real, storm = bench._split_storms(["stormy", "quietbad"], probes)
    assert real == ["quietbad"] and storm == ["stormy"]
    # no probe data at all -> everything stays a real flag
    real, storm = bench._split_storms(["a", "b"], {})
    assert real == ["a", "b"] and storm == []
    # flag not in the probe dict -> real (no evidence to excuse it)
    real, storm = bench._split_storms(["ghost"], probes)
    assert real == ["ghost"] and storm == []


def test_classifier_agrees_with_bench_flagged_regressed():
    """bench.py's inline _regressions rule and classify()'s DRIFT class
    implement the same gate — pin that equivalence on a fixture that
    exercises every branch (inside / above+big / above+tiny-floored /
    above+tiny-3x)."""
    noise = _env(
        a_in=(1.0, 1.1),
        b_big=(1.0, 1.1),
        c_tiny=(0.05, 0.06),
        d_tiny3x=(0.05, 0.06),
    )
    run = _run(a_in=1.05, b_big=2.0, c_tiny=0.12, d_tiny3x=0.29)
    res = bench_noise.classify(noise, run)
    drift_names = sorted(d[0] for d in res["drift"])
    # replicate bench.py's _regressions on the same fixture
    head = noise["spread_p95"]
    flagged = sorted(
        n
        for n, t in run["queries_exec_only"].items()
        if (q := noise["queries"].get(n)) is not None
        and t > q["exec_max"] * head
        and (t > 0.3 or t > 3 * q["exec_max"])
    )
    assert drift_names == flagged == ["b_big", "d_tiny3x"]
