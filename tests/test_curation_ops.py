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


class TestHashSplit:
    def test_fractions_and_determinism(self):
        from textgraphs_ray.stages.sampling import hash_split

        rows = [{"doc_id": i} for i in range(4000)]
        out = hash_split(_ds(rows),
                         splits={"train": 0.75, "val": 0.125,
                                 "test": 0.125}).to_pandas()
        frac = out["split"].value_counts(normalize=True)
        assert abs(frac["train"] - 0.75) < 0.03
        assert abs(frac["val"] - 0.125) < 0.02
        assert abs(frac["test"] - 0.125) < 0.02
        # block layout must not change any assignment
        out2 = hash_split(
            rd.from_arrow(pa.Table.from_pylist(rows)).repartition(13),
            splits={"train": 0.75, "val": 0.125,
                    "test": 0.125}).to_pandas()
        a = out.sort_values("doc_id").reset_index(drop=True)
        b = out2.sort_values("doc_id").reset_index(drop=True)
        assert a.equals(b)

    def test_group_key_prevents_leakage(self):
        """Splitting on a shared group key puts every member of a
        cluster in the same split (the split_assign pattern)."""
        from textgraphs_ray.stages.sampling import hash_split

        rows = [{"doc_id": i, "cluster": i % 37} for i in range(500)]
        out = hash_split(_ds(rows), key_col="cluster",
                         splits={"train": 0.5, "test": 0.5}).to_pandas()
        assert (out.groupby("cluster")["split"].nunique() == 1).all()

    def test_remainder_falls_in_last_split(self):
        from textgraphs_ray.stages.sampling import hash_split

        out = hash_split(_ds([{"doc_id": i} for i in range(1000)]),
                         splits={"a": 0.25, "b": 0.25}).to_pandas()
        # fractions sum to 0.5; the ~50% remainder lands in 'b'
        assert set(out["split"]) == {"a", "b"}
        assert (out["split"] == "b").mean() > 0.6


class TestChunkWindows:
    def test_boundaries_and_overlap(self):
        from textgraphs_ray.stages.text import chunk_windows

        text = "".join(chr(97 + (i % 26)) for i in range(1050))
        out = (chunk_windows(_ds([{"doc_id": 1, "text": text}]),
                             size=500, stride=400)
               .to_pandas().sort_values("chunk_id"))
        # ceil(1050/400) = 3 chunks
        assert list(out["chunk_id"]) == [0, 1, 2]
        assert list(out["chunk_len"]) == [500, 500, 250]
        assert out["chunk_text"].iloc[0] == text[0:500]
        assert out["chunk_text"].iloc[1] == text[400:900]
        assert out["chunk_text"].iloc[2] == text[800:1050]
        # overlap: consecutive chunks share size - stride chars
        assert out["chunk_text"].iloc[0][400:] == \
            out["chunk_text"].iloc[1][:100]

    def test_empty_and_short_docs(self):
        from textgraphs_ray.stages.text import chunk_windows

        out = chunk_windows(
            _ds([{"doc_id": 1, "text": ""},
                 {"doc_id": 2, "text": None},
                 {"doc_id": 3, "text": "tiny"}]),
            size=500, stride=400).to_pandas()
        assert set(out["doc_id"]) == {3}
        assert list(out["chunk_len"]) == [4]

    def test_no_fully_covered_windows(self):
        """When size > stride, a window whose content is entirely
        inside the previous one is NOT emitted (len=500/size=500/
        stride=400 used to yield a chunk [400,500) already covered by
        chunk 0)."""
        from textgraphs_ray.stages.text import chunk_windows

        out = chunk_windows(
            _ds([{"doc_id": 1, "text": "x" * 500},
                 {"doc_id": 2, "text": "y" * 900},
                 {"doc_id": 3, "text": "z" * 901}]),
            size=500, stride=400).to_pandas()
        per_doc = out.groupby("doc_id")["chunk_id"].count()
        assert per_doc.loc[1] == 1      # len == size → one chunk
        assert per_doc.loc[2] == 2      # [0,500) + [400,900)
        assert per_doc.loc[3] == 3      # one char past → third window

    def test_full_coverage_reconstruction(self):
        """Stride-prefix concatenation of the chunks reproduces the
        document — no character lost or duplicated."""
        from textgraphs_ray.stages.text import chunk_windows

        rng = np.random.default_rng(3)
        docs = [{"doc_id": i,
                 "text": "".join(rng.choice(list("abcdef "),
                                            size=int(n)))}
                for i, n in enumerate(rng.integers(1, 2000, size=20))]
        out = chunk_windows(_ds(docs), size=500, stride=400).to_pandas()
        for i, d in enumerate(docs):
            g = (out[out["doc_id"] == i].sort_values("chunk_id")
                 ["chunk_text"].tolist())
            rebuilt = "".join([c[:400] for c in g[:-1]] + g[-1:])
            assert rebuilt == d["text"]


class TestHashSplitValidation:
    def test_over_one_fractions_raise(self):
        import pytest

        from textgraphs_ray.stages.sampling import hash_split

        with pytest.raises(ValueError, match="sum"):
            hash_split(_ds([{"doc_id": 1}]),
                       splits={"train": 0.8, "val": 0.3})


class TestLeakageSafeSplit:
    def _graph(self):
        # components: {a,b,c} (chain), {d,e}, singleton {f}
        nodes = _ds([{"key": k} for k in "abcdef"])
        edges = _ds([{"key_a": "a", "key_b": "b"},
                     {"key_a": "b", "key_b": "c"},
                     {"key_a": "d", "key_b": "e"}])
        return nodes, edges

    def test_components_move_atomically(self):
        from textgraphs_ray.stages.sampling import leakage_safe_split

        nodes, edges = self._graph()
        out = leakage_safe_split(
            nodes, edges,
            splits={"train": 0.5, "test": 0.5}).take_all()
        assert len(out) == 6
        by_cluster: dict = {}
        for r in out:
            by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
        # every component has exactly ONE split — the leakage fence
        assert all(len(s) == 1 for s in by_cluster.values())
        # min-label roots: chain abc labels to 'a', pair de to 'd'
        got = {r["key"]: r["cluster_id"] for r in out}
        assert got["a"] == got["b"] == got["c"] == "a"
        assert got["d"] == got["e"] == "d"
        assert got["f"] == "f"

    def test_matches_hash_split_of_cluster_id(self):
        from textgraphs_ray.stages.sampling import (hash_split,
                                                    leakage_safe_split,
                                                    md5_frac)

        nodes, edges = self._graph()
        out = {r["key"]: r["split"]
               for r in leakage_safe_split(
                   nodes, edges,
                   splits={"train": 0.8, "test": 0.2}).take_all()}
        # the split IS the md5 variate of the component label
        for key, cid in (("a", "a"), ("d", "d"), ("f", "f")):
            want = "train" if md5_frac([cid])[0] < 0.8 else "test"
            assert out[key] == want


class TestGopherGate:
    def _run(self, texts, **kw):
        from textgraphs_ray.stages.text import GopherGate

        batch = pa.table({"doc_id": pa.array(range(len(texts)),
                                             pa.int64()),
                          "text": pa.array(texts, pa.string())})
        return GopherGate(**kw)(batch).to_pylist()

    def test_signals_and_verdict(self):
        rows = self._run(
            ["the quick brown fox jumps over a lazy dog again today "
             "with more words padding the gate minimum for this doc "
             "plus extra tokens here now"],
            min_words=20, max_words=90)
        r = rows[0]
        assert r["n_words"] == 26
        assert r["stop_hits"] >= 2          # 'the', 'a'
        assert r["passes"] == 1

    def test_each_rule_fails_independently(self):
        # too short
        assert self._run(["a b"], min_words=20)[0]["passes"] == 0
        # mean word length out of band (all 1-char words)
        short = " ".join(["a"] * 30)
        r = self._run([short], min_wl=3.5)[0]
        assert r["mean_wl"] == 1.0 and r["passes"] == 0
        # no stopwords
        text = " ".join(f"tok{i} word{i} item{i}" for i in range(10))
        r = self._run([text], min_stop_hits=1)[0]
        assert r["stop_hits"] == 0 and r["passes"] == 0
        # single-word repetition
        spam = " ".join(["the"] + ["spam"] * 39)
        r = self._run([spam], max_top_frac=0.2)[0]
        assert r["top_frac"] == round(39 / 40, 6) and r["passes"] == 0

    def test_empty_and_null_docs_emit_zeros(self):
        rows = self._run(["", None])
        for r in rows:
            assert (r["n_words"], r["stop_hits"], r["passes"]) == (0, 0, 0)
            assert r["mean_wl"] == 0.0 and r["top_frac"] == 0.0
