"""ngram_diversity (stages/text.py distinct-n corpus diversity)."""

from __future__ import annotations

import numpy as np


def test_ngram_diversity_closed_form():
    import pyarrow as pa
    import ray.data as rd

    from textgraphs_ray.stages.text import ngram_diversity

    ds = rd.from_arrow(pa.table({
        "source": pa.array(["a", "a", "b"], pa.string()),
        "text": pa.array(["the cat sat", "the cat ran",
                          "zz zz zz zz"], pa.string())}))
    got = {r["source"]: (r["n_ngrams"], r["n_distinct"], r["ratio"])
           for r in ngram_diversity(ds, group_col="source",
                                    n=2).take_all()}
    # a: bigrams {the cat, cat sat} + {the cat, cat ran} → 4 total,
    # 3 distinct
    assert got["a"] == (4, 3, 0.75)
    # b: "zz zz" × 3 → 3 total, 1 distinct
    assert got["b"] == (3, 1, round(1 / 3, 6))


def test_ngram_diversity_matches_brute():
    import pyarrow as pa
    import ray.data as rd

    from textgraphs_ray.stages.text import ngram_diversity

    rng = np.random.default_rng(6)
    vocab = ["ab", "cd", "ef", "gh"]
    rows = []
    for i in range(80):
        words = [vocab[int(x)] for x in rng.integers(0, 4,
                                                     rng.integers(0, 6))]
        rows.append((f"s{i % 3}", " ".join(words)))
    ds = rd.from_arrow(pa.table({
        "source": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string())}))
    got = {r["source"]: (r["n_ngrams"], r["n_distinct"])
           for r in ngram_diversity(ds, group_col="source",
                                    n=2).take_all()}
    want_tot: dict[str, int] = {}
    want_dis: dict[str, set] = {}
    for g, txt in rows:
        ws = [w for w in txt.split(" ") if w]
        want_tot[g] = want_tot.get(g, 0) + max(0, len(ws) - 1)
        for i in range(len(ws) - 1):
            want_dis.setdefault(g, set()).add((ws[i], ws[i + 1]))
    for g in want_tot:
        assert got[g] == (want_tot[g], len(want_dis.get(g, set()))), g
