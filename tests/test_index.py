"""Inverted index, PMI co-occurrence, bigram LM (stages/index.py)."""

from __future__ import annotations

import math
from collections import Counter
from itertools import combinations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from textgraphs_ray.stages.index import (bigram_counts, bigram_logprob,
                                         inverted_index, pmi_pairs)

DOCS = [
    (0, "alpha beta gamma alpha"),
    (1, "beta gamma delta"),
    (2, "alpha delta delta epsilon"),
    (3, "beta beta gamma"),
    (4, "zeta"),
    (5, ""),
]


def _ds():
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
        "text": pa.array([t for _, t in DOCS], pa.string()),
    }))


def test_inverted_index_exact():
    out = {r["term"]: r for r in
           inverted_index(_ds(), min_df=1, postings_cap=32).take_all()}
    # brute force
    tf: dict[str, Counter] = {}
    for did, t in DOCS:
        for w, c in Counter(t.split()).items():
            tf.setdefault(w, Counter())[did] = c
    assert set(out) == set(tf)
    for w, per_doc in tf.items():
        assert out[w]["df"] == len(per_doc)
        assert out[w]["cf"] == sum(per_doc.values())
        assert out[w]["postings"] == ",".join(
            str(d) for d in sorted(per_doc))


def test_inverted_index_min_df_and_cap():
    out = {r["term"]: r for r in
           inverted_index(_ds(), min_df=2, postings_cap=2).take_all()}
    assert "zeta" not in out          # df = 1 dropped
    assert "epsilon" not in out
    # alpha appears in docs 0 and 2 — cap 2 keeps both; beta in 0,1,3
    # — cap keeps the first two ascending, df/cf stay exact
    assert out["beta"]["df"] == 3
    assert out["beta"]["cf"] == 4
    assert out["beta"]["postings"] == "0,1"


def test_pmi_values_and_plan_parity():
    got = pmi_pairs(_ds(), top_k=100, min_count=2).take_all()
    # brute force: doc-level pair counts
    sets = [set(t.split()) for _, t in DOCS if t]
    n_docs = len(DOCS)
    joint: Counter = Counter()
    for s in sets:
        joint.update(combinations(sorted(s), 2))
    marg: Counter = Counter()
    for s in sets:
        marg.update(s)
    exp = {(a, b): (n, round(math.log(n * n_docs
                                      / (marg[a] * marg[b])), 6))
           for (a, b), n in joint.items() if n >= 2}
    assert {(r["w1"], r["w2"]): (r["n_xy"], r["pmi"])
            for r in got} == exp

    forced = pmi_pairs(_ds(), top_k=100, min_count=2,
                       broadcast_vocab_max=0,
                       num_partitions=4).take_all()
    key = lambda r: (r["w1"], r["w2"])  # noqa: E731
    assert sorted(map(dict, forced), key=key) \
        == sorted(map(dict, got), key=key)


def test_pmi_top_k_tiebreak():
    got = pmi_pairs(_ds(), top_k=2, min_count=1).take_all()
    assert len(got) == 2
    # rank by n_xy desc then (w1, w2) asc — deterministic boundary
    counts = [r["n_xy"] for r in got]
    assert counts == sorted(counts, reverse=True)


def test_bigram_counts():
    out = {(r["w1"], r["w2"]): r["c"]
           for r in bigram_counts(_ds()).take_all()}
    exp: Counter = Counter()
    for _, t in DOCS:
        ws = t.split()
        exp.update(zip(ws, ws[1:]))
    assert out == dict(exp)


def test_bigram_logprob_exact_and_parity():
    got = {r["doc_id"]: r for r in bigram_logprob(_ds()).take_all()}
    # docs with < 2 tokens are dropped
    assert set(got) == {0, 1, 2, 3}
    # brute-force MLE
    c12: Counter = Counter()
    for _, t in DOCS:
        ws = t.split()
        c12.update(zip(ws, ws[1:]))
    c1: Counter = Counter()
    for (a, _), c in c12.items():
        c1[a] += c
    for did, t in DOCS[:4]:
        ws = t.split()
        bgs = list(zip(ws, ws[1:]))
        lp = sum(math.log(c12[p] / c1[p[0]]) for p in bgs) / len(bgs)
        assert got[did]["n_bigrams"] == len(bgs)
        assert got[did]["logprob"] == pytest.approx(round(lp, 6),
                                                    abs=1e-9)

    forced = {r["doc_id"]: r for r in
              bigram_logprob(_ds(), broadcast_vocab_max=0,
                             num_partitions=4).take_all()}
    assert {d: (r["n_bigrams"], r["logprob"])
            for d, r in forced.items()} \
        == {d: (r["n_bigrams"], r["logprob"]) for d, r in got.items()}


def test_bigram_cross_corpus_oov_floor():
    other = rd.from_arrow(pa.table({
        "doc_id": pa.array([9], pa.int64()),
        "text": pa.array(["unseen words only here"], pa.string()),
    }))
    # score a disjoint corpus against DOCS' model: every bigram OOV —
    # takes the ln(0.5 / total) floor, never raises (both plans)
    total = sum(Counter(zip(t.split(), t.split()[1:])).total()
                for _, t in DOCS)
    floor = round(float(np.log(0.5 / total)), 6)
    for kw in ({}, {"broadcast_vocab_max": 0, "num_partitions": 2}):
        out = bigram_logprob(other, stats_ds=_ds(), **kw).take_all()
        assert len(out) == 1
        assert out[0]["n_bigrams"] == 3
        assert out[0]["logprob"] == pytest.approx(floor, abs=1e-9)


# ---- group_jaccard_pairs --------------------------------------------

def test_group_jaccard_exact(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from textgraphs_ray.stages.index import group_jaccard_pairs

    docs = [("a", "cat dog fish"), ("a", "dog bird"),
            ("b", "cat dog"), ("b", "mouse"),
            ("c", "zebra")]
    ds = rd.from_arrow(pa.table({
        "source": pa.array([d[0] for d in docs]),
        "text": pa.array([d[1] for d in docs])})).repartition(3)
    got = {(r["g1"], r["g2"]): r
           for r in group_jaccard_pairs(ds).take_all()}
    # vocab: a={cat,dog,fish,bird}(4) b={cat,dog,mouse}(3) c={zebra}
    ab = got[("a", "b")]
    assert ab["inter"] == 2
    assert abs(ab["jaccard"] - 2 / 5) < 1e-6
    # c shares nothing — absent
    assert ("a", "c") not in got and ("b", "c") not in got
