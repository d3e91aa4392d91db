"""Fellegi–Sunter EM linkage (stages/linkage.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from textgraphs_ray.stages.linkage import (default_fields, fellegi_sunter,
                                           fs_em)


def _synth_patterns(n_match=2000, n_unmatch=20000, seed=0,
                    m=(0.95, 0.9, 0.85), u=(0.05, 0.1, 0.2)):
    """Pattern histogram drawn from a known 3-field FS model."""
    rng = np.random.default_rng(seed)
    hist: dict[int, int] = {}
    for is_match, n, probs in ((True, n_match, m), (False, n_unmatch, u)):
        bits = rng.random((n, 3)) < np.array(probs)
        pats = (bits << np.arange(3)).sum(axis=1)
        for p in pats:
            hist[int(p)] = hist.get(int(p), 0) + 1
    return hist


def test_em_recovers_planted_parameters():
    hist = _synth_patterns()
    fit = fs_em(hist, 3, iters=200)
    # prevalence 2000/22000 ≈ 0.0909
    assert abs(fit["p"] - 2000 / 22000) < 0.03
    for i, (mi, ui) in enumerate(zip((0.95, 0.9, 0.85),
                                     (0.05, 0.1, 0.2))):
        assert abs(fit["m"][i] - mi) < 0.08, (i, fit["m"])
        assert abs(fit["u"][i] - ui) < 0.08, (i, fit["u"])
    # all-agree pattern posterior ~1, all-disagree ~0
    post = dict(zip(fit["patterns"].tolist(), fit["posterior"]))
    assert post[7] > 0.95 and post[0] < 0.05


def test_fellegi_sunter_separates_name_variants(ray_session):
    # matches: typo/phonetic variants; unmatches: random name pairs
    matches = [("john smith", "john smyth"),
               ("mary johnson", "mary jonson"),
               ("robert miller", "robert miler"),
               ("alice cooper", "alice coper")] * 30
    unmatches = [("john smith", "peter baker"),
                 ("mary johnson", "carol diaz"),
                 ("robert miller", "susan wright"),
                 ("alice cooper", "frank holt")] * 250
    pairs = matches + unmatches
    ds = rd.from_arrow(pa.table({
        "text_a": pa.array([p[0] for p in pairs]),
        "text_b": pa.array([p[1] for p in pairs])})).repartition(4)
    res = fellegi_sunter(ds, iters=60)
    scored = res["scored"].to_pandas()
    match_rows = scored.head(0)
    m_mask = scored.apply(
        lambda r: (r["text_a"], r["text_b"]) in set(matches), axis=1)
    assert scored[m_mask]["is_match"].all()
    assert not scored[~m_mask]["is_match"].any()
    # weights order: agreeing patterns outscore disagreeing ones
    assert (scored[m_mask]["weight"].min()
            > scored[~m_mask]["weight"].max())


def test_partition_invariance(ray_session):
    pairs = [("anna lee", "anna lee")] * 50 + \
            [("anna lee", "bob stone")] * 500
    t = pa.table({"text_a": pa.array([p[0] for p in pairs]),
                  "text_b": pa.array([p[1] for p in pairs])})
    r1 = fellegi_sunter(rd.from_arrow(t).repartition(1))
    r8 = fellegi_sunter(rd.from_arrow(t).repartition(8))
    assert r1["patterns"].equals(r8["patterns"])


def test_empty_pairs(ray_session):
    t = pa.table({"text_a": pa.array([], pa.string()),
                  "text_b": pa.array([], pa.string())})
    res = fellegi_sunter(rd.from_arrow(t))
    assert res["model"] is None and len(res["patterns"]) == 0
