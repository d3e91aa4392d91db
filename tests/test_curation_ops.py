"""Decontamination + deterministic importance sampling
(stages/decontam.py, stages/sampling.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from textgraphs_ray.stages.decontam import (Decontaminator,
                                            _gram_hashes_flat,
                                            benchmark_gram_hashes,
                                            decontaminate)
from textgraphs_ray.stages.sampling import importance_sample, md5_frac


def _ds(rows: list[dict]) -> "rd.Dataset":
    return rd.from_arrow(pa.Table.from_pylist(rows))


class TestDecontam:
    def test_planted_contamination(self):
        bench = _ds([{"doc_id": 100, "text": "a b c d e f g h trailing"}])
        train = _ds([
            # contains the benchmark 8-gram twice (positions 0 and 9)
            {"doc_id": 1, "text": "a b c d e f g h x a b c d e f g h"},
            # shares 7-grams but never a full 8-gram
            {"doc_id": 2, "text": "a b c d e f g X h"},
            {"doc_id": 3, "text": "totally different words here only"},
        ])
        out = decontaminate(train, bench, n=8).to_pandas()
        got = dict(zip(out["doc_id"], out["n_hits"]))
        assert got == {1: 2, 2: 0, 3: 0}  # doc1: the gram at starts 0 and 9
        flags = dict(zip(out["doc_id"], out["contaminated"]))
        assert flags == {1: 1, 2: 0, 3: 0}

    def test_hits_match_string_bruteforce(self):
        rng = np.random.default_rng(7)
        vocab = [f"w{i}" for i in range(12)]
        docs = [" ".join(rng.choice(vocab, size=rng.integers(4, 30)))
                for _ in range(40)]
        n = 5
        bench_texts, train_texts = docs[:8], docs[8:]
        bench_set = set()
        for t in bench_texts:
            w = t.split()
            bench_set |= {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}
        bench = _ds([{"doc_id": i, "text": t}
                     for i, t in enumerate(bench_texts)])
        train = _ds([{"doc_id": i, "text": t}
                     for i, t in enumerate(train_texts)])
        out = decontaminate(train, bench, n=n).to_pandas()
        got = dict(zip(out["doc_id"], out["n_hits"]))
        for i, t in enumerate(train_texts):
            w = t.split()
            expect = sum(" ".join(w[j:j + n]) in bench_set
                         for j in range(len(w) - n + 1))
            assert got[i] == expect, (i, t)

    def test_grams_never_cross_doc_boundary(self):
        # "d e" at the end of doc0 + "f g" at the start of doc1 must NOT
        # form a gram even though they are adjacent in the flat array
        gh, idx = _gram_hashes_flat(["a b c d e", "f g h i j"], 4)
        assert len(gh) == 4  # 2 windows per doc, none crossing
        assert set(idx.tolist()) == {0, 1}

    def test_short_and_empty_rows(self):
        gh, idx = _gram_hashes_flat(["one two", "", None, "a b c"], 3)
        assert len(gh) == 1 and idx.tolist() == [3]
        bench = _ds([{"doc_id": 0, "text": "x y z"}])
        train = _ds([{"doc_id": 1, "text": ""}, {"doc_id": 2, "text": "x"}])
        out = decontaminate(train, bench, n=3).to_pandas()
        assert out["n_hits"].tolist() == [0, 0]

    def test_empty_benchmark_flags_nothing(self):
        empty = _ds([{"doc_id": 0, "text": "a"}]).filter(
            lambda r: False)
        assert len(benchmark_gram_hashes(empty, n=3)) == 0
        train = _ds([{"doc_id": 1, "text": "a b c d"}])
        out = decontaminate(train, empty, n=3).to_pandas()
        assert out["contaminated"].tolist() == [0]

    def test_decontaminator_accepts_plain_array(self):
        # actors can be handed the raw array (tests / non-Ray callers)
        h = benchmark_gram_hashes(_ds([{"doc_id": 0, "text": "p q r s"}]),
                                  n=3)
        d = Decontaminator(h, n=3)
        out = d(pa.Table.from_pylist([{"doc_id": 1, "text": "z p q r s"}]))
        assert out.column("n_hits").to_pylist() == [2]


class TestImportanceSample:
    def test_selection_is_exact_md5_rule(self):
        rows = [{"doc_id": i, "p_keep": p}
                for i, p in enumerate([0.0, 0.25, 0.5, 0.75, 1.0] * 40)]
        out = importance_sample(_ds(rows), prob_col="p_keep").to_pandas()
        expect = {r["doc_id"] for r in rows
                  if md5_frac([r["doc_id"]])[0] < r["p_keep"]}
        assert set(out["doc_id"]) == expect
        # p=0 never kept, p=1 always kept
        assert not any(d % 5 == 0 for d in out["doc_id"])
        assert sum(1 for d in out["doc_id"] if d % 5 == 4) == 40

    def test_invariant_under_block_layout(self):
        rows = [{"doc_id": i, "p_keep": 0.5} for i in range(300)]
        a = importance_sample(_ds(rows), prob_col="p_keep").to_pandas()
        b = importance_sample(_ds(rows).repartition(13),
                              prob_col="p_keep").to_pandas()
        assert sorted(a["doc_id"]) == sorted(b["doc_id"])

    def test_md5_frac_matches_duckdb(self):
        import duckdb

        keys = list(range(50))
        ours = md5_frac(keys)
        theirs = duckdb.sql(
            "SELECT ('0x' || substr(md5(k::VARCHAR), 1, 8))::UBIGINT"
            " / 4294967296.0 AS f FROM (SELECT unnest(range(50)) AS k)"
        ).df()["f"].to_numpy()
        assert np.array_equal(ours, theirs)
