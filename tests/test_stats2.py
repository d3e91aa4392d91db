"""Skewness/kurtosis, entropy, ARI (stages/stats.py additions)."""

from __future__ import annotations

import math
from itertools import combinations

import numpy as np
import pyarrow as pa
import ray.data as rd

from textgraphs_ray.stages.stats import (adjusted_rand, entropy_group,
                                         skew_kurt_group)


def test_skew_kurt_matches_numpy_moments():
    rng = np.random.default_rng(3)
    xs = {"a": rng.integers(1, 500, 300),
          "b": rng.integers(1, 50, 120)}
    ds = rd.from_arrow(pa.table({
        "g": pa.array([g for g, v in xs.items() for _ in v]),
        "x": pa.array(np.concatenate(list(xs.values())))}))
    got = {r["g"]: r for r in skew_kurt_group(
        ds, value_col="x", group_col="g").take_all()}
    for g, v in xs.items():
        v = v.astype(np.float64)
        m = v.mean()
        m2 = ((v - m) ** 2).mean()
        m3 = ((v - m) ** 3).mean()
        m4 = ((v - m) ** 4).mean()
        assert got[g]["n"] == len(v)
        assert abs(got[g]["skew"] - m3 / m2 ** 1.5) < 1e-5
        assert abs(got[g]["kurt"] - (m4 / m2 ** 2 - 3.0)) < 1e-5


def test_skew_kurt_symmetric_distribution_has_zero_skew():
    v = np.array([1, 2, 3, 4, 5] * 10, np.int64)
    ds = rd.from_arrow(pa.table({"g": pa.array(["s"] * len(v)),
                                 "x": pa.array(v)}))
    [r] = skew_kurt_group(ds, value_col="x", group_col="g").take_all()
    assert r["skew"] == 0.0
    assert abs(r["kurt"] - (-1.3)) < 1e-9  # uniform over 5 points


def test_entropy_group_closed_forms():
    # uniform over 4 classes → 2 bits; single class → 0 bits
    rows = [("u", c) for c in "abcd" * 8] + [("s", "z")] * 7
    ds = rd.from_arrow(pa.table({
        "g": pa.array([r[0] for r in rows]),
        "cls": pa.array([r[1] for r in rows])}))
    got = {r["g"]: r for r in entropy_group(
        ds, class_col="cls", group_col="g").take_all()}
    assert got["u"]["n"] == 32 and got["u"]["entropy"] == 2.0
    assert got["s"]["n"] == 7 and got["s"]["entropy"] == 0.0


def test_entropy_group_matches_direct():
    rng = np.random.default_rng(9)
    cls = rng.choice(list("abcde"), 500, p=[.4, .3, .15, .1, .05])
    ds = rd.from_arrow(pa.table({"g": pa.array(["g"] * 500),
                                 "cls": pa.array(cls)}))
    [r] = entropy_group(ds, class_col="cls", group_col="g").take_all()
    want = -sum((c / 500) * math.log2(c / 500)
                for c in np.unique(cls, return_counts=True)[1])
    assert abs(r["entropy"] - want) < 1e-6


def _brute_ari(a, b):
    n = len(a)
    s_nij = s_ai = s_bj = 0
    same_a = same_b = same_both = 0
    for i, j in combinations(range(n), 2):
        sa, sb = a[i] == a[j], b[i] == b[j]
        same_a += sa
        same_b += sb
        same_both += sa and sb
    npairs = n * (n - 1) // 2
    exp = same_a * same_b / npairs
    return (same_both - exp) / ((same_a + same_b) / 2 - exp)


def test_ari_identical_partitions_is_one():
    a = ["x", "x", "y", "y", "z"] * 6
    ds = rd.from_arrow(pa.table({"a": pa.array(a), "b": pa.array(a)}))
    [r] = adjusted_rand(ds, a_col="a", b_col="b").take_all()
    assert r["ari"] == 1.0


def test_ari_matches_brute_pair_counting():
    rng = np.random.default_rng(17)
    a = rng.choice(list("pqr"), 60).tolist()
    b = rng.choice(list("mn"), 60).tolist()
    ds = rd.from_arrow(pa.table({"a": pa.array(a), "b": pa.array(b)}))
    [r] = adjusted_rand(ds, a_col="a", b_col="b").take_all()
    assert abs(r["ari"] - _brute_ari(a, b)) < 1e-6
    assert r["n"] == 60


# ---------------------------------------------------------------- MAD


def _int_ds(groups, values):
    import pyarrow as _pa
    import ray.data as _rd
    return _rd.from_arrow(_pa.table({
        "g": _pa.array(list(groups), _pa.string()),
        "x": _pa.array(list(values), _pa.int64())}))


def _brute_med2(vals):
    v = sorted(vals)
    n = len(v)
    return v[(n - 1) // 2] + v[n // 2]


def test_grouped_median_x2_matches_sorted():
    from textgraphs_ray.stages.stats import grouped_median_x2

    rng = np.random.default_rng(23)
    groups = [f"g{int(i)}" for i in rng.integers(0, 4, 500)]
    values = [int(x) for x in rng.integers(0, 10_000, 500)]
    base = _int_ds(groups, values).materialize()
    got = grouped_median_x2(lambda: base, value_col="x",
                            group_col="g", lo=0, hi=1 << 20)
    for _, row in got.iterrows():
        vals = [v for g, v in zip(groups, values) if g == row["g"]]
        assert row["n"] == len(vals)
        assert row["med_x2"] == _brute_med2(vals), row["g"]


def test_mad_group_matches_brute():
    from textgraphs_ray.stages.stats import mad_group

    rng = np.random.default_rng(5)
    groups = [f"s{int(i)}" for i in rng.integers(0, 3, 300)]
    values = [int(x) for x in rng.integers(0, 1000, 300)]
    base = _int_ds(groups, values).materialize()
    got = mad_group(lambda: base, value_col="x", group_col="g",
                    lo=0, hi=1 << 20)
    assert list(got.columns) == ["g", "n", "med_x2", "mad_x4"]
    for _, row in got.iterrows():
        vals = [v for g, v in zip(groups, values) if g == row["g"]]
        med2 = _brute_med2(vals)
        dev2 = [abs(2 * v - med2) for v in vals]
        assert row["med_x2"] == med2
        assert row["mad_x4"] == _brute_med2(dev2)


def test_mad_group_odd_even_and_ties():
    from textgraphs_ray.stages.stats import mad_group

    groups = ["a"] * 5 + ["b"] * 4 + ["c"] * 3
    values = [1, 2, 3, 4, 100, 10, 10, 20, 20, 7, 7, 7]
    base = _int_ds(groups, values).materialize()
    got = mad_group(lambda: base, value_col="x", group_col="g",
                    lo=0, hi=256).set_index("g")
    # a: median 3 → med_x2 6; dev2 = |2x−6| = 4,2,0,2,194 →
    # median(dev2) = 2 → mad_x4 = 4 (MAD = 1)
    assert tuple(got.loc["a"]) == (5, 6, 4)
    # b: med_x2 = 10+20 = 30; dev2 = 10,10,10,10 → mad_x4 = 20
    assert tuple(got.loc["b"]) == (4, 30, 20)
    # c: all equal → MAD 0
    assert tuple(got.loc["c"]) == (3, 14, 0)


# -------------------------------------------------------------- CUSUM


def test_cusum_step_change_detected():
    from textgraphs_ray.stages.stats import cusum_change_point

    # group 7: 5,5,5,9,9,9 → split at k=3
    ds = _seq_ds([(7, i + 1, x) for i, x in
                  enumerate([5, 5, 5, 9, 9, 9])])
    got = {r["g"]: (r["n"], r["k_star"], r["m_star"])
           for r in cusum_change_point(
               ds, group_col="g", seq_col="i",
               value_col="x").take_all()}
    n, tot = 6, 42
    m3 = n * 15 - 3 * tot
    assert got[7] == (6, 3, m3)


def test_cusum_singleton_groups_drop_and_ties_to_smallest_k():
    from textgraphs_ray.stages.stats import cusum_change_point

    rows = [(1, 1, 10),              # n = 1 → no row
            (2, 1, 4), (2, 2, 8), (2, 3, 4)]  # |M1| = |M2| → k = 1
    got = {r["g"]: (r["k_star"], r["m_star"])
           for r in cusum_change_point(
               _seq_ds(rows), group_col="g", seq_col="i",
               value_col="x").take_all()}
    assert 1 not in got
    assert got[2] == (1, 3 * 4 - 1 * 16)


def test_cusum_matches_brute():
    from textgraphs_ray.stages.stats import cusum_change_point

    rng = np.random.default_rng(9)
    rows = []
    for g in range(30):
        n = int(rng.integers(1, 9))
        for i in range(n):
            rows.append((g, i + 1, int(rng.integers(0, 100))))
    got = {r["g"]: (r["n"], r["k_star"], r["m_star"])
           for r in cusum_change_point(
               _seq_ds(rows), group_col="g", seq_col="i",
               value_col="x", num_partitions=7).take_all()}
    want = {}
    for g in range(30):
        xs = [x for gg, _, x in rows if gg == g]
        n, tot = len(xs), sum(xs)
        if n < 2:
            continue
        best = None
        p = 0
        for k in range(1, n):
            p += xs[k - 1]
            mk = n * p - k * tot
            if best is None or abs(mk) > abs(best[1]):
                best = (k, mk)
        want[g] = (n, best[0], best[1])
    assert got == want


def _seq_ds(rows):
    import pyarrow as _pa
    import ray.data as _rd
    return _rd.from_arrow(_pa.table({
        "g": _pa.array([r[0] for r in rows], _pa.int64()),
        "i": _pa.array([r[1] for r in rows], _pa.int64()),
        "x": _pa.array([r[2] for r in rows], _pa.int64())}))


# ---------------------------------------------------------- autocorr


def test_autocorr_perfect_and_anti():
    from textgraphs_ray.stages.stats import autocorr_lag1

    rows = ([(1, i, i) for i in range(1, 9)]          # ramp → r1 = 1
            + [(2, i, [3, 9][i % 2]) for i in range(1, 9)]  # alternate
            + [(3, 1, 5), (3, 2, 5), (3, 3, 5)]       # constant → 0.0
            + [(4, 1, 7)])                            # singleton → drop
    got = {r["g"]: r for r in autocorr_lag1(
        _seq_ds(rows), group_col="g", seq_col="i",
        value_col="x").take_all()}
    assert got[1]["r1"] == 1.0
    assert got[2]["r1"] == -1.0
    assert got[3]["r1"] == 0.0 and got[3]["m"] == 2
    assert 4 not in got


def test_autocorr_matches_numpy():
    from textgraphs_ray.stages.stats import autocorr_lag1

    rng = np.random.default_rng(12)
    rows = []
    for g in range(20):
        n = int(rng.integers(2, 12))
        for i in range(n):
            rows.append((g, i + 1, int(rng.integers(0, 50))))
    got = {r["g"]: r for r in autocorr_lag1(
        _seq_ds(rows), group_col="g", seq_col="i",
        value_col="x", num_partitions=5).take_all()}
    for g in range(20):
        xs = np.array([x for gg, _, x in rows if gg == g], np.int64)
        a, b = xs[:-1].astype(float), xs[1:].astype(float)
        r = got[g]
        assert r["m"] == len(a)
        assert r["sxy"] == int((xs[:-1] * xs[1:]).sum())
        if a.std() > 0 and b.std() > 0:
            want = round(float(np.corrcoef(a, b)[0, 1]), 6)
            assert abs(r["r1"] - want) < 2e-6, g


# ------------------------------------------------- weighted median


def test_grouped_weighted_median_matches_brute():
    from textgraphs_ray.stages.stats import grouped_weighted_median

    rng = np.random.default_rng(19)
    rows = [(f"g{int(i)}", int(x), int(w) + 1) for i, x, w in
            zip(rng.integers(0, 4, 400), rng.integers(0, 500, 400),
                rng.integers(0, 9, 400))]
    base = rd.from_arrow(pa.table({
        "g": pa.array([r[0] for r in rows], pa.string()),
        "x": pa.array([r[1] for r in rows], pa.int64()),
        "w": pa.array([r[2] for r in rows], pa.int64())})).materialize()
    got = grouped_weighted_median(lambda: base, value_col="x",
                                  weight_col="w", group_col="g",
                                  lo=0, hi=1 << 12).set_index("g")
    for g in sorted({r[0] for r in rows}):
        items = sorted((x, w) for gg, x, w in rows if gg == g)
        W = sum(w for _, w in items)
        k = (W + 1) // 2
        cum = 0
        for x, w in items:
            cum += w
            if cum >= k:
                want = x
                break
        assert tuple(got.loc[g]) == (W, want), g


def test_grouped_weighted_median_unit_weights_is_lower_median():
    from textgraphs_ray.stages.stats import grouped_weighted_median

    base = rd.from_arrow(pa.table({
        "g": pa.array(["a"] * 4, pa.string()),
        "x": pa.array([10, 20, 30, 40], pa.int64()),
        "w": pa.array([1, 1, 1, 1], pa.int64())})).materialize()
    got = grouped_weighted_median(lambda: base, value_col="x",
                                  weight_col="w", group_col="g",
                                  lo=0, hi=64)
    # even count, unit weights → LOWER median (k = 2 → 20)
    assert tuple(got.iloc[0]) == ("a", 4, 20)


def test_mad_group_plan_parity_on_testdata():
    """The selection plan and the forced sort plan are
    OUTPUT-IDENTICAL (repo invariant for alternate physical plans)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __ray_entry__ as entry

    sf = "/root/testdata/sf0.001"
    a = (entry.queries()["mad_group"](sf)
         .sort_values("source").reset_index(drop=True))
    b = (entry.queries()["mad_group_sortplan"](sf).to_pandas()
         .sort_values("source").reset_index(drop=True))
    assert list(a.columns) == list(b.columns)
    assert a.equals(b.astype(a.dtypes.to_dict()))
