"""Kneser–Ney bigram scoring (stages/index.py kneser_ney_logprob)
vs a brute single-process reference."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import ray.data

from textgraphs_ray.stages.index import kneser_ney_logprob

DOCS = ["the cat sat on the mat",
        "the dog sat on the log",
        "a cat and a dog",
        "the cat the cat the cat"]


def _brute_kn(train: list[str], score: list[str], d: float = 0.75):
    c12: Counter = Counter()
    for t in train:
        ws = t.split()
        c12.update(zip(ws, ws[1:]))
    c1: Counter = Counter()
    n1f: Counter = Counter()
    n1p: Counter = Counter()
    for (w1, w2), c in c12.items():
        c1[w1] += c
        n1f[w1] += 1
        n1p[w2] += 1
    nbt = len(c12)
    total = sum(c12.values())
    floor = math.log(0.5 / total)
    out = {}
    for i, t in enumerate(score):
        ws = t.split()
        if len(ws) < 2:
            continue
        s = 0.0
        for p in zip(ws, ws[1:]):
            if p in c12:
                s += math.log(
                    max(c12[p] - d, 0.0) / c1[p[0]]
                    + d * n1f[p[0]] / c1[p[0]] * (n1p[p[1]] / nbt))
            elif p[0] in c1 and p[1] in n1p:
                s += math.log(
                    d * n1f[p[0]] / c1[p[0]] * (n1p[p[1]] / nbt))
            else:
                s += floor
        out[i] = round(s / (len(ws) - 1), 6)
    return out


def _ds(texts):
    return ray.data.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts}))


def test_kn_matches_brute_same_corpus():
    got = {r["doc_id"]: r["logprob"]
           for r in kneser_ney_logprob(_ds(DOCS)).take_all()}
    assert got == _brute_kn(DOCS, DOCS)


def test_kn_cross_corpus_backoff_and_floor():
    train = DOCS[:2]
    score = ["the cat sat", "unseen tokens here", "dog the"]
    got = {r["doc_id"]: r["logprob"]
           for r in kneser_ney_logprob(
               _ds(score), stats_ds=_ds(train)).take_all()}
    assert got == _brute_kn(train, score)


def test_kn_short_docs_dropped():
    out = kneser_ney_logprob(_ds(["single", ""])).take_all()
    assert out == []
