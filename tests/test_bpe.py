"""BPE merge learning and encoding (stages/bpe.py)."""

from __future__ import annotations

from collections import Counter

import pyarrow as pa
import pytest
import ray.data as rd

from textgraphs_ray.stages.bpe import bpe_encode, bpe_learn

DOCS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new",
]


def _ds():
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(DOCS)), pa.int64()),
        "text": pa.array(DOCS, pa.string()),
    }))


def _brute_bpe(word_counts: dict[str, int], n_merges: int,
               min_pair_count: int):
    """Reference BPE (Sennrich): weighted adjacent-pair counts, ties
    lexicographic, left-to-right merge application."""
    syms = {w: list(w) for w in word_counts}
    merges = []
    for step in range(n_merges):
        pc: Counter = Counter()
        for w, n in word_counts.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += n
        cand = [(n, pair) for pair, n in pc.items()
                if n >= min_pair_count]
        if not cand:
            break
        # tie-break: highest count, then lexicographically SMALLEST
        best_n = max(n for n, _ in cand)
        a, b = min(pair for n, pair in cand if n == best_n)
        merges.append((step, a, b, a + b, best_n))
        for w in syms:
            s = syms[w]
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


def _word_counts():
    wc: Counter = Counter()
    for d in DOCS:
        wc.update(d.split())
    return dict(wc)


def test_bpe_matches_reference():
    got = [(r["step"], r["lhs"], r["rhs"], r["merged"], r["count"])
           for r in bpe_learn(_ds(), n_merges=8).take_all()]
    exp = _brute_bpe(_word_counts(), 8, 2)
    assert got == exp
    assert len(got) == 8


def test_bpe_plan_parity():
    base = bpe_learn(_ds(), n_merges=6).take_all()
    forced = bpe_learn(_ds(), n_merges=6,
                       driver_vocab_max=0, num_blocks=3).take_all()
    key = lambda r: r["step"]  # noqa: E731
    assert sorted(map(dict, forced), key=key) \
        == sorted(map(dict, base), key=key)


def test_bpe_early_stop():
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["ab cd ef"], pa.string())}))
    # every adjacent pair occurs once < min_pair_count=2 → no merges
    assert bpe_learn(ds, n_merges=5).take_all() == []


def test_bpe_encode_counts():
    merges = bpe_learn(_ds(), n_merges=50).take_all()
    got = {r["doc_id"]: r["n_tokens"]
           for r in bpe_encode(_ds(), merges).take_all()}
    # with enough merges every frequent word collapses to few tokens;
    # counts are positive and bounded by char counts
    for did, d in enumerate(DOCS):
        n_chars = sum(len(w) for w in d.split())
        assert 0 < got[did] <= n_chars
    # 'low' appears 5 times and must be a single token by now
    one = bpe_encode(rd.from_arrow(pa.table({
        "doc_id": pa.array([9], pa.int64()),
        "text": pa.array(["low low"], pa.string())})),
        merges).take_all()
    assert one[0]["n_tokens"] == 2
