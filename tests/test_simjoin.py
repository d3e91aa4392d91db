"""stages/simjoin.py: exact set-similarity join — brute-force parity
at several thresholds, both physical plans, dense-overlap regime (pairs
share MANY prefix shingles, so duplicate emission would show up as
extra rows), and empty/degenerate inputs."""

from __future__ import annotations

import string

import numpy as np
import pyarrow as pa
import ray.data as rd

from textgraphs_ray.stages.simjoin import (_prefix_len, _shingle_set,
                                           set_similarity_join)


def _corpus(rng, n_docs: int, vocab_size: int, dense: bool):
    vocab = ["".join(rng.choice(list(string.ascii_lowercase), 4))
             for _ in range(vocab_size)]
    docs = [" ".join(rng.choice(vocab, rng.randint(5, 30)))
            for _ in range(n_docs)]
    if dense:
        # mutated copies of one template: high pairwise Jaccard, many
        # shared prefix shingles per pair
        base = docs[0].split()
        for i in range(1, n_docs, 2):
            mut = list(base)
            for _ in range(rng.randint(0, 4)):
                mut[rng.randint(len(mut))] = rng.choice(vocab)
            docs[i] = " ".join(mut)
    return docs


def _brute(A, B, tau, n=3):
    out = []
    for ia, da in A:
        sa = set(_shingle_set(da, n))
        if not sa:
            continue
        for ib, db in B:
            sb = set(_shingle_set(db, n))
            if not sb:
                continue
            inter = len(sa & sb)
            if inter and inter / (len(sa) + len(sb) - inter) >= tau:
                out.append((ia, ib, inter / (len(sa) + len(sb) - inter)))
    return sorted(out)


def _table(rows):
    return pa.table({"doc_id": pa.array([i for i, _ in rows], pa.int64()),
                     "text": [d for _, d in rows]})


def _run(A, B, tau, bmax):
    got = set_similarity_join(rd.from_arrow(_table(A)),
                              rd.from_arrow(_table(B)), tau=tau,
                              broadcast_vocab_max=bmax).to_pandas()
    return sorted(zip(got["a_id"], got["b_id"], got["jaccard"]))


class TestSetSimilarityJoin:
    def _check(self, docs, taus):
        A = [(i, d) for i, d in enumerate(docs) if i % 2 == 0]
        B = [(i, d) for i, d in enumerate(docs) if i % 2 == 1]
        for tau in taus:
            want = _brute(A, B, tau)
            for bmax in (10**6, 0):   # broadcast plan / forced join plan
                got = _run(A, B, tau, bmax)
                assert len(got) == len(want), (tau, bmax)
                for (a, b, j), (c, d, k) in zip(got, want):
                    assert (a, b) == (c, d) and abs(j - k) < 1e-12

    def test_sparse_corpus_matches_brute(self):
        rng = np.random.RandomState(3)
        docs = _corpus(rng, 80, 40, dense=False)
        docs[1] = docs[0] + " extra words here"
        docs[3] = docs[2]
        self._check(docs, (0.05, 0.5, 1.0))

    def test_dense_overlap_exactly_once(self):
        """Mutated copies of one template: every qualifying pair shares
        MANY prefix shingles — any double emission across groups breaks
        the row-count parity."""
        rng = np.random.RandomState(11)
        docs = _corpus(rng, 40, 25, dense=True)
        self._check(docs, (0.2, 0.6, 0.9))

    def test_empty_and_short_docs(self):
        A = [(0, "alpha beta gamma delta"), (2, "xy"), (4, "")]
        B = [(1, "alpha beta gamma delta"), (3, None)]
        got = _run(A, B, 0.5, 10**6)
        assert got == [(0, 1, 1.0)]

    def test_empty_side_returns_typed_empty(self):
        A = [(0, "alpha beta gamma delta")]
        empty = rd.from_arrow(_table(A)).filter(lambda r: False)
        out = set_similarity_join(rd.from_arrow(_table(A)), empty,
                                  tau=0.5)
        assert out.count() == 0
        assert sorted(out.schema().names) == ["a_id", "b_id", "jaccard"]

    def test_prefix_len_float_ceiling(self):
        """tau*n that is an exact integer must not ceil UP (would
        shrink the prefix and lose recall): 0.8*5 = 4.000…04 in
        float."""
        assert _prefix_len(5, 0.8) == 2    # 5 - 4 + 1
        assert _prefix_len(10, 1.0) == 1
        assert _prefix_len(7, 0.3) == 5    # 7 - ceil(2.1)=3 + 1


def _brute_measure(A, B, tau, measure, n=3):
    import math
    out = []
    for ia, da in A:
        sa = set(_shingle_set(da, n))
        if not sa:
            continue
        for ib, db in B:
            sb = set(_shingle_set(db, n))
            if not sb:
                continue
            inter = len(sa & sb)
            if not inter:
                continue
            if measure == "cosine":
                v = inter / math.sqrt(len(sa) * len(sb))
            elif measure == "dice":
                v = 2 * inter / (len(sa) + len(sb))
            else:
                v = inter / (len(sa) + len(sb) - inter)
            if v >= tau:
                out.append((ia, ib, v))
    return sorted(out)


class TestMeasureVariants:
    def _check(self, docs, measure, taus):
        A = [(i, d) for i, d in enumerate(docs) if i % 2 == 0]
        B = [(i, d) for i, d in enumerate(docs) if i % 2 == 1]
        for tau in taus:
            want = _brute_measure(A, B, tau, measure)
            got = set_similarity_join(
                rd.from_arrow(_table(A)), rd.from_arrow(_table(B)),
                tau=tau, measure=measure).to_pandas()
            rows = sorted(zip(got["a_id"], got["b_id"], got[measure]))
            assert len(rows) == len(want), (measure, tau)
            for (a, b, j), (c, d, k) in zip(rows, want):
                assert (a, b) == (c, d) and abs(j - k) < 1e-12

    def test_cosine_matches_brute(self):
        rng = np.random.RandomState(5)
        docs = _corpus(rng, 60, 30, dense=True)
        self._check(docs, "cosine", (0.2, 0.6, 0.95))

    def test_dice_matches_brute(self):
        rng = np.random.RandomState(9)
        docs = _corpus(rng, 60, 30, dense=True)
        self._check(docs, "dice", (0.2, 0.6, 0.95))

    def test_unknown_measure_raises(self):
        import pytest
        A = rd.from_arrow(_table([(0, "a b c d")]))
        with pytest.raises(ValueError):
            set_similarity_join(A, A, tau=0.5, measure="overlap")


class TestContainmentJoin:
    def _brute(self, A, B):
        out = set()
        for ia, da in A:
            sa = set(_shingle_set(da, 1))
            if not sa:
                continue
            for ib, db in B:
                if sa <= set(_shingle_set(db, 1)):
                    out.add((ia, ib))
        return out

    def test_matches_brute(self):
        from textgraphs_ray.stages.simjoin import set_containment_join
        rng = np.random.RandomState(17)
        vocab = [f"w{i}" for i in range(30)]
        docs = [" ".join(rng.choice(vocab, rng.randint(1, 12)))
                for _ in range(80)]
        docs[2] = docs[1] + " extra"          # strict superset pair
        docs[4] = docs[3]                     # equal sets both ways
        A = [(i, d) for i, d in enumerate(docs) if i % 2 == 0]
        B = [(i, d) for i, d in enumerate(docs) if i % 2 == 1]
        got = set_containment_join(
            rd.from_arrow(_table(A)), rd.from_arrow(_table(B)))
        rows = {(r["a_id"], r["b_id"]) for r in got.take_all()}
        assert rows == self._brute(A, B)

    def test_empty_and_unmatchable(self):
        from textgraphs_ray.stages.simjoin import set_containment_join
        A = [(0, "zebra unique token"), (2, "")]
        B = [(1, "totally different words")]
        got = set_containment_join(rd.from_arrow(_table(A)),
                                   rd.from_arrow(_table(B)))
        assert got.count() == 0
        assert sorted(got.schema().names) == ["a_id", "b_id"]
