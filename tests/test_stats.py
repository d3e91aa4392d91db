"""Per-group z-score and quantile filter (stages/stats.py)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from textgraphs_ray.stages.stats import (group_quantile_filter,
                                         group_quantile_thresholds,
                                         group_zscore)


def _mk(groups, values):
    return rd.from_arrow(pa.table({
        "id": pa.array(range(len(values)), pa.int64()),
        "g": pa.array(groups, pa.string()),
        "x": pa.array(values, pa.int64()),
    }))


def test_zscore_matches_population_formula():
    groups = ["a"] * 5 + ["b"] * 4
    vals = [10, 20, 30, 40, 50, 7, 7, 9, 13]
    got = {r["id"]: r["z"]
           for r in group_zscore(_mk(groups, vals), value_col="x",
                                 group_col="g",
                                 id_col="id").take_all()}
    for gname in ("a", "b"):
        xs = [v for g, v in zip(groups, vals) if g == gname]
        mean = sum(xs) / len(xs)
        sd = math.sqrt(sum(v * v for v in xs) / len(xs) - mean * mean)
        for i, (g, v) in enumerate(zip(groups, vals)):
            if g == gname:
                assert got[i] == pytest.approx(
                    round((v - mean) / sd, 6), abs=1e-9)


def test_zscore_constant_group_is_zero():
    got = group_zscore(_mk(["c"] * 3, [5, 5, 5]), value_col="x",
                       group_col="g", id_col="id").take_all()
    assert [r["z"] for r in got] == [0.0, 0.0, 0.0]


def test_zscore_plan_parity():
    rng = np.random.default_rng(3)
    groups = rng.choice(["a", "b", "c"], 200).tolist()
    vals = rng.integers(0, 1000, 200).tolist()
    ds = _mk(groups, vals)
    base = {r["id"]: r["z"]
            for r in group_zscore(ds, value_col="x", group_col="g",
                                  id_col="id").take_all()}
    forced = {r["id"]: r["z"]
              for r in group_zscore(ds, value_col="x", group_col="g",
                                    id_col="id",
                                    broadcast_groups_max=0,
                                    num_partitions=4).take_all()}
    assert forced == base


def test_quantile_threshold_rule():
    # one group, values 0..99, q=0.1, bins aligned to integers:
    # threshold = lower edge of the bin holding rank ceil(0.1*100)=10
    # → value 9 (bin width 1, lo=0, hi=100, nbins=100)
    ds = _mk(["a"] * 100, list(range(100)))
    thr = group_quantile_thresholds(ds, value_col="x", group_col="g",
                                    q=0.1, lo=0.0, hi=100.0,
                                    nbins=100).take_all()
    assert thr[0]["threshold"] == 9.0

    kept = group_quantile_filter(ds, value_col="x", group_col="g",
                                 q=0.1, lo=0.0, hi=100.0,
                                 nbins=100).take_all()
    assert sorted(r["x"] for r in kept) == list(range(9, 100))


def test_quantile_filter_per_group_thresholds_differ():
    groups = ["lo"] * 50 + ["hi"] * 50
    vals = list(range(50)) + list(range(1000, 1050))
    kept = group_quantile_filter(_mk(groups, vals), value_col="x",
                                 group_col="g", q=0.5, lo=0.0,
                                 hi=2048.0, nbins=2048).take_all()
    lo_kept = sorted(r["x"] for r in kept if r["g"] == "lo")
    hi_kept = sorted(r["x"] for r in kept if r["g"] == "hi")
    # each group drops ITS OWN bottom half — the 'lo' group keeps
    # values ≥ its median even though all are below the global one
    assert lo_kept == list(range(24, 50))
    assert hi_kept == list(range(1024, 1050))


# ---- class_divergence (stages/stats.py) -----------------------------

def test_class_divergence_closed_form(ray_session):
    import math

    import pyarrow as pa
    import ray.data as rd

    from textgraphs_ray.stages.stats import class_divergence

    # source A: 2 en + 2 fr (uniform); source B: 4 en only
    rows = [("A", "en"), ("A", "en"), ("A", "fr"), ("A", "fr"),
            ("B", "en"), ("B", "en"), ("B", "en"), ("B", "en")]
    ds = rd.from_arrow(pa.table({
        "source": pa.array([r[0] for r in rows]),
        "lang": pa.array([r[1] for r in rows])})).repartition(3)
    out = class_divergence(ds, group_col="source", class_col="lang")
    got = {r["source"]: r for _, r in out.iterrows()}
    # corpus q = (en 6/8, fr 2/8)
    q = [0.75, 0.25]
    pA = [0.5, 0.5]
    mA = [(a + b) / 2 for a, b in zip(pA, q)]
    jsdA = sum(0.5 * p * math.log(p / m) for p, m in zip(pA, mA) if p)
    jsdA += sum(0.5 * qq * math.log(qq / m) for qq, m in zip(q, mA) if qq)
    pB = [1.0, 0.0]
    mB = [(a + b) / 2 for a, b in zip(pB, q)]
    jsdB = sum(0.5 * p * math.log(p / m) for p, m in zip(pB, mB) if p)
    jsdB += sum(0.5 * qq * math.log(qq / m) for qq, m in zip(q, mB) if qq)
    assert got["A"]["n_docs"] == 4 and got["B"]["n_docs"] == 4
    assert abs(got["A"]["entropy"] - math.log(2)) < 1e-6
    assert got["B"]["entropy"] == 0.0
    assert abs(got["A"]["jsd"] - jsdA) < 1e-6
    assert abs(got["B"]["jsd"] - jsdB) < 1e-6


# ---- winnow_fingerprints (stages/text.py) ---------------------------

def _brute_winnow(s, k, w):
    import hashlib as hl
    n = len(s) - k + 1
    if n < 1:
        return None
    hs = [int(hl.md5(s[i:i + k].encode()).hexdigest()[:16], 16)
          for i in range(n)]
    if n <= w:
        sel = {min(hs)}
    else:
        sel = {min(hs[j:j + w]) for j in range(n - w + 1)}
    return sorted(sel)


def test_winnow_matches_brute_and_guarantee(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from textgraphs_ray.stages.text import winnow_fingerprints

    shared = "the quick brown fox jumps"
    docs = ["abcdefghij klmnop " + shared,
            shared + " zzz totally different tail here",
            "short",          # < k: no row
            "exactlyeig",     # few k-grams: single window
            ""]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs)})).repartition(2)
    out = {r["doc_id"]: r
           for r in winnow_fingerprints(ds, k=8, w=4).take_all()}
    assert 2 not in out and 4 not in out
    for i in (0, 1, 3):
        want = _brute_winnow(docs[i], 8, 4)
        assert out[i]["n_fp"] == len(want)
        assert out[i]["min_fp"] == f"{want[0]:016x}"
    # winnowing guarantee: an 11-char shared substring must yield a
    # shared fingerprint between docs 0 and 1
    s0 = set(_brute_winnow(docs[0], 8, 4))
    s1 = set(_brute_winnow(docs[1], 8, 4))
    assert s0 & s1


# ---- group_corr (stages/stats.py) -----------------------------------

def test_group_corr_matches_numpy(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from textgraphs_ray.stages.stats import group_corr

    rng = np.random.default_rng(2)
    g = rng.integers(0, 4, 200)
    x = rng.integers(0, 50, 200)
    y = (2 * x + rng.integers(0, 30, 200)) * (g + 1)
    ds = rd.from_arrow(pa.table({
        "g": pa.array(g.astype(np.int64)),
        "x": pa.array(x.astype(np.int64)),
        "y": pa.array(y.astype(np.int64))})).repartition(5)
    out = {r["g"]: r for r in
           group_corr(ds, x_col="x", y_col="y",
                      group_col="g").take_all()}
    for gi in range(4):
        m = g == gi
        want = np.corrcoef(x[m], y[m])[0, 1]
        assert out[gi]["n"] == int(m.sum())
        assert abs(out[gi]["corr"] - want) < 1e-6


def test_group_corr_degenerate_group(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from textgraphs_ray.stages.stats import group_corr

    ds = rd.from_arrow(pa.table({
        "g": pa.array(["a"] * 3),
        "x": pa.array([5, 5, 5]),      # zero variance
        "y": pa.array([1, 2, 3])}))
    out = group_corr(ds, x_col="x", y_col="y",
                     group_col="g").take_all()
    assert out[0]["corr"] == 0.0


# ---- group_mad_outliers (stages/stats.py) ---------------------------

def test_group_mad_outliers_closed_form(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from textgraphs_ray.stages.stats import group_mad_outliers

    # group a: 1..9 plus a wild outlier 1000
    xs = list(range(1, 10)) + [1000]
    ds = rd.from_arrow(pa.table({
        "g": pa.array(["a"] * 10 + ["b"] * 4),
        "x": pa.array(xs + [5, 5, 5, 5])})).repartition(3)
    out = {r["g"]: r for r in
           group_mad_outliers(ds, value_col="x",
                              group_col="g").take_all()}
    a = np.array(xs, float)
    med = np.median(a)
    mad = np.median(np.abs(a - med))
    assert out["a"]["med"] == med and out["a"]["mad"] == mad
    assert out["a"]["n_outliers"] == int(
        (np.abs(a - med) > 3 * mad).sum())
    # constant group: mad 0, nothing beyond 0
    assert out["b"]["mad"] == 0.0 and out["b"]["n_outliers"] == 0


# ---- selection_quantile (stages/stats.py) ---------------------------

def test_selection_quantile_matches_sorted_rank(ray_session):
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from textgraphs_ray.stages.stats import selection_quantile

    rng = np.random.default_rng(4)
    vals = rng.integers(0, 10000, 777)
    t = pa.table({"x": pa.array(vals.astype(np.int64))})
    for q in (0.1, 0.5, 0.75, 0.99, 1.0):
        out = selection_quantile(
            lambda: rd.from_arrow(t).repartition(4),
            value_col="x", q=q, lo=0, hi=1 << 20).iloc[0]
        k = max(1, math.ceil(777 * q))
        assert out["value"] == int(np.sort(vals)[k - 1]), q
        assert out["n"] == 777 and out["k"] == k


def test_selection_quantile_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from textgraphs_ray.stages.stats import selection_quantile

    t = pa.table({"x": pa.array([], pa.int64())})
    out = selection_quantile(lambda: rd.from_arrow(t),
                             value_col="x", q=0.5, lo=0, hi=100)
    assert out.iloc[0]["n"] == 0


# ---------------------------------------------------------------------------
# welch_t_pairs / ks_pairs / gini_group (round 4)


def _welch_expected(xs, ys):
    na, nb = len(xs), len(ys)
    ma, mb = sum(xs) / na, sum(ys) / nb
    va = (sum(v * v for v in xs) - sum(xs) ** 2 / na) / (na - 1)
    vb = (sum(v * v for v in ys) - sum(ys) ** 2 / nb) / (nb - 1)
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    df = se2 * se2 / ((va / na) ** 2 / (na - 1)
                      + (vb / nb) ** 2 / (nb - 1))
    return round(t, 6), round(df, 6)


def test_welch_t_pairs_formula():
    from textgraphs_ray.stages.stats import welch_t_pairs

    xs = [10, 12, 9, 14, 11, 13]
    ys = [20, 25, 22, 30]
    df = welch_t_pairs(_mk(["a"] * len(xs) + ["b"] * len(ys),
                           xs + ys),
                       value_col="x", group_col="g")
    assert list(df["g_a"]) == ["a"] and list(df["g_b"]) == ["b"]
    t, dof = _welch_expected(xs, ys)
    assert df["t_stat"][0] == pytest.approx(t, abs=1e-9)
    assert df["df"][0] == pytest.approx(dof, abs=1e-6)


def test_welch_t_pairs_skips_singletons():
    from textgraphs_ray.stages.stats import welch_t_pairs

    df = welch_t_pairs(_mk(["a", "a", "b"], [1, 2, 9]),
                       value_col="x", group_col="g")
    assert len(df) == 0


def _ks_expected(xs, ys):
    vals = sorted(set(xs) | set(ys))
    na, nb = len(xs), len(ys)
    best, at = -1, None
    for v in vals:
        ca = sum(1 for x in xs if x <= v)
        cb = sum(1 for y in ys if y <= v)
        num = abs(ca * nb - cb * na)
        if num > best:
            best, at = num, v
    return round(best / (na * nb), 6), at


def test_ks_pairs_brute_force():
    from textgraphs_ray.stages.stats import ks_pairs

    rng = np.random.default_rng(7)
    xs = rng.integers(0, 30, 80).tolist()
    ys = (rng.integers(5, 40, 50)).tolist()
    df = ks_pairs(_mk(["a"] * len(xs) + ["b"] * len(ys), xs + ys),
                  value_col="x", group_col="g")
    ks, at = _ks_expected(xs, ys)
    assert len(df) == 1
    assert df["ks"][0] == pytest.approx(ks, abs=1e-9)
    assert df["at_v"][0] == at
    assert (df["n_a"][0], df["n_b"][0]) == (len(xs), len(ys))


def test_ks_pairs_identical_distributions():
    from textgraphs_ray.stages.stats import ks_pairs

    xs = [1, 2, 3, 4] * 5
    df = ks_pairs(_mk(["a"] * 20 + ["b"] * 20, xs + xs),
                  value_col="x", group_col="g")
    assert df["ks"][0] == 0.0


def test_ks_pairs_all_group_pairs():
    from textgraphs_ray.stages.stats import ks_pairs

    df = ks_pairs(_mk(["a", "a", "b", "b", "c", "c"],
                      [1, 2, 3, 4, 5, 6]),
                  value_col="x", group_col="g")
    assert sorted(zip(df["g_a"], df["g_b"])) == [
        ("a", "b"), ("a", "c"), ("b", "c")]


def _gini_expected(xs):
    x = sorted(xs)
    n, sx = len(x), sum(x)
    six = sum((i + 1) * v for i, v in enumerate(x))
    return round((2 * six - (n + 1) * sx) / (n * sx), 6)


def test_gini_group_formula():
    from textgraphs_ray.stages.stats import gini_group

    a = [10, 10, 10, 10]          # perfectly equal -> 0
    b = [0, 0, 0, 100]            # concentrated -> (n-1)/n
    got = {r["grp"]: (r["n"], r["gini"])
           for r in gini_group(_mk(["a"] * 4 + ["b"] * 4, a + b),
                               value_col="x",
                               group_col="g").take_all()}
    assert got["a"] == (4, 0.0)
    assert got["b"] == (4, pytest.approx(0.75, abs=1e-9))
    assert got["b"][1] == _gini_expected(b)


def test_gini_group_zero_sum_and_random():
    from textgraphs_ray.stages.stats import gini_group

    rng = np.random.default_rng(5)
    xs = rng.integers(0, 10_000, 300).tolist()
    got = {r["grp"]: r["gini"]
           for r in gini_group(_mk(["z"] * 3 + ["r"] * 300,
                                   [0, 0, 0] + xs),
                               value_col="x",
                               group_col="g").take_all()}
    assert got["z"] == 0.0
    assert got["r"] == pytest.approx(_gini_expected(xs), abs=1e-9)
