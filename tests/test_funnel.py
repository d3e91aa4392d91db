"""funnel_counts (stages/funnel.py) vs a brute-force greedy chain."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from textgraphs_ray.stages.funnel import funnel_counts

STEPS = ["a", "b", "c"]


def _events_ds(rows):
    return rd.from_arrow(pa.table({
        "u": pa.array([r[0] for r in rows], pa.int64()),
        "et": pa.array([r[1] for r in rows], pa.string()),
        "ts": pa.array([r[2] for r in rows], pa.int64())}))


def _counts(ds):
    out = funnel_counts(ds, user_col="u", type_col="et", ts_col="ts",
                        steps=STEPS)
    return {r["step"]: (r["step_name"], r["n_users"])
            for r in out.take_all()}


def _brute(rows):
    by_user: dict[int, list] = {}
    for u, et, ts in rows:
        by_user.setdefault(u, []).append((ts, et))
    reached = [0] * len(STEPS)
    for evs in by_user.values():
        evs.sort()
        t_prev = None
        for k, s in enumerate(STEPS):
            cand = [t for t, e in evs if e == s
                    and (t_prev is None or t > t_prev)]
            if not cand:
                break
            t_prev = min(cand)
            reached[k] += 1
    return reached


def test_funnel_basic_chain():
    rows = [(1, "a", 10), (1, "b", 20), (1, "c", 30),   # full funnel
            (2, "a", 10), (2, "b", 5),                  # b BEFORE a
            (3, "b", 10), (3, "c", 20),                 # never views
            (4, "a", 10), (4, "c", 20)]                 # skips b
    got = _counts(_events_ds(rows))
    assert got == {1: ("a", 3), 2: ("b", 1), 3: ("c", 1)}


def test_funnel_strictly_after_not_equal():
    # a step at the SAME timestamp as the previous one does not count
    rows = [(1, "a", 10), (1, "b", 10), (1, "b", 11)]
    got = _counts(_events_ds(rows))
    assert got[2] == ("b", 1)  # via ts=11, not ts=10
    rows2 = [(1, "a", 10), (1, "b", 10)]
    assert _counts(_events_ds(rows2))[2] == ("b", 0)


def test_funnel_greedy_min_is_optimal():
    # earliest-b (ts=20) still leaves room for c at 25
    rows = [(1, "a", 10), (1, "b", 20), (1, "b", 30), (1, "c", 25)]
    got = _counts(_events_ds(rows))
    assert got[3] == ("c", 1)


def test_funnel_zero_rows_emit_all_steps():
    got = _counts(_events_ds([(1, "x", 5)]))
    assert got == {1: ("a", 0), 2: ("b", 0), 3: ("c", 0)}


@pytest.mark.parametrize("seed", [3, 17])
def test_funnel_matches_brute(seed):
    rng = np.random.default_rng(seed)
    types = STEPS + ["x", "y"]
    rows = [(int(rng.integers(0, 40)),
             types[int(rng.integers(0, len(types)))],
             int(rng.integers(0, 1000)))
            for _ in range(600)]
    got = _counts(_events_ds(rows))
    want = _brute(rows)
    assert [got[k + 1][1] for k in range(3)] == want


def test_funnel_rejects_bad_steps():
    ds = _events_ds([(1, "a", 1)])
    with pytest.raises(ValueError):
        funnel_counts(ds, user_col="u", type_col="et", ts_col="ts",
                      steps=[])
    with pytest.raises(ValueError):
        funnel_counts(ds, user_col="u", type_col="et", ts_col="ts",
                      steps=["a", "a"])


def test_path_trigrams_matches_brute():
    from textgraphs_ray.stages.funnel import path_trigrams

    rng = np.random.default_rng(8)
    types = list("abcd")
    rows = [(int(u), types[int(t)], int(ts), eid)
            for eid, (u, t, ts) in enumerate(zip(
                rng.integers(0, 12, 500), rng.integers(0, 4, 500),
                rng.integers(0, 100, 500)))]
    ds = rd.from_arrow(pa.table({
        "u": pa.array([r[0] for r in rows], pa.int64()),
        "et": pa.array([r[1] for r in rows], pa.string()),
        "ts": pa.array([r[2] for r in rows], pa.int64()),
        "eid": pa.array([r[3] for r in rows], pa.int64())}))
    got = [(r["a"], r["b"], r["c"], r["n"]) for r in path_trigrams(
        ds, user_col="u", type_col="et", ts_col="ts",
        id_col="eid", k=15).take_all()]
    from collections import Counter
    by_user: dict[int, list] = {}
    for u, et, ts, eid in rows:
        by_user.setdefault(u, []).append((ts, eid, et))
    cnt: Counter = Counter()
    for evs in by_user.values():
        evs.sort()
        ets = [e for _, _, e in evs]
        for i in range(len(ets) - 2):
            cnt[(ets[i], ets[i + 1], ets[i + 2])] += 1
    brute = sorted(((n, a, b, c) for (a, b, c), n in cnt.items()),
                   key=lambda t: (-t[0], t[1], t[2], t[3]))[:15]
    assert got == [(a, b, c, n) for n, a, b, c in brute]
