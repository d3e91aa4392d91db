"""stages/tfidf.py bm25_topk: scores match a straightforward
single-process reference implementation, block-layout invariance,
ranking/tie-break determinism, and edge cases."""

from __future__ import annotations

import math
import re

import pyarrow as pa
import ray.data as rd

from textgraphs_ray.stages.tfidf import bm25_topk

_WORD = re.compile(r"[a-z]+")

DOCS = [
    ("d0", "hash join beats nested loop join on large tables"),
    ("d1", "a scan then a hash aggregate"),
    ("d2", "sort merge join with a full table scan and another scan"),
    ("d3", "no relevant terms here at all"),
    ("d4", "hash hash hash"),
    ("d5", ""),
    ("d6", "join"),
]


def _reference_bm25(docs, terms, k1=1.2, b=0.75):
    toks = {d: _WORD.findall(t.lower()) for d, t in docs}
    n = len(docs)
    avgdl = sum(len(w) for w in toks.values()) / n
    out = {}
    for q in terms:
        df = sum(1 for w in toks.values() if q in w)
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for d, w in toks.items():
            tf = w.count(q)
            if tf:
                out[d] = out.get(d, 0.0) + (
                    idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(w) / avgdl)))
    return out


def _ds(blocks: int = 1) -> "rd.Dataset":
    t = pa.table({"doc_id": [d for d, _ in DOCS],
                  "text": [t for _, t in DOCS]})
    return rd.from_arrow(t).repartition(blocks)


class TestBM25:
    def test_matches_reference_scores(self):
        terms = ["hash", "join", "scan"]
        want = _reference_bm25(DOCS, terms)
        got = bm25_topk(_ds(), terms, k=10)
        assert set(got["doc_id"]) == set(want)  # d3/d5 never emitted
        for _, row in got.iterrows():
            assert abs(row["score"] - want[row["doc_id"]]) < 1e-6

    def test_block_layout_invariant(self):
        terms = ["hash", "scan"]
        a = bm25_topk(_ds(1), terms, k=5)
        b = bm25_topk(_ds(4), terms, k=5)
        assert a.equals(b)

    def test_top_k_truncation_and_order(self):
        got = bm25_topk(_ds(3), ["join"], k=2)
        assert len(got) == 2
        assert list(got["score"]) == sorted(got["score"], reverse=True)

    def test_no_matches_returns_empty(self):
        got = bm25_topk(_ds(2), ["zzzznope"], k=5)
        assert len(got) == 0

    def test_empty_dataset(self):
        empty = rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.string()),
            "text": pa.array([], pa.string())}))
        got = bm25_topk(empty, ["hash"], k=5)
        assert len(got) == 0
