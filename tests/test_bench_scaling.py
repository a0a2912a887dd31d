"""Pure-logic tests for bench_scaling's pair-efficiency computation.

The subprocess-driven parts (run_level / interleaved) are exercised by
the scaling windows recorded in BENCH.md; here we pin the per-pair
arithmetic and the serve-only (``--reuse-index``) degenerate case where
build efficiency is undefined.
"""

import sys

sys.path.insert(0, "/root/repo")

from bench_scaling import pair_stats  # noqa: E402


def _run(pps, qps, build_sec=10.0, query_sec=2.0):
    return {
        "postings_per_sec": pps,
        "qps": qps,
        "build_sec": build_sec,
        "query_sec": query_sec,
    }


def test_pair_stats_perfect_scaling():
    p = pair_stats(0, _run(100_000.0, 50.0), _run(400_000.0, 200.0))
    assert p["build_eff"] == 1.0
    assert p["query_eff"] == 1.0
    assert p["pair"] == 0


def test_pair_stats_sublinear():
    p = pair_stats(1, _run(100_000.0, 80.0), _run(280_000.0, 240.0))
    assert p["build_eff"] == 0.7
    assert p["query_eff"] == 0.75


def test_pair_stats_serve_only_no_build_eff():
    # --reuse-index runs report postings_per_sec None (build_sec 0):
    # build efficiency is undefined, query efficiency still computed
    p = pair_stats(2, _run(None, 85.0, build_sec=0.0), _run(None, 340.0, build_sec=0.0))
    assert p["build_eff"] is None
    assert p["query_eff"] == 1.0
    assert p["lo_build_sec"] == 0.0 and p["hi_build_sec"] == 0.0


def test_pair_stats_mixed_none_is_serve_only():
    # one side missing a build (shouldn't happen, but the guard must
    # not divide by None either way)
    p = pair_stats(3, _run(None, 50.0), _run(400_000.0, 100.0))
    assert p["build_eff"] is None
    assert p["query_eff"] == 0.5


def test_pair_stats_carries_raw_walls():
    p = pair_stats(4, _run(1.0, 1.0, build_sec=150.2, query_sec=188.4),
                   _run(4.0, 4.0, build_sec=55.1, query_sec=47.9))
    assert p["lo_build_sec"] == 150.2
    assert p["hi_build_sec"] == 55.1
    assert p["lo_query_sec"] == 188.4
    assert p["hi_query_sec"] == 47.9
