"""Distributed multinomial Naive Bayes (stages/classify.py)."""

from __future__ import annotations

import random

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from textgraphs_ray.stages.classify import nb_classify, nb_train

SIG = {
    "news": ["election", "minister", "parliament", "policy"],
    "code": ["compiler", "function", "pointer", "segfault"],
    "bio": ["genome", "protein", "enzyme", "mitosis"],
}
FILLER = ["the", "a", "of", "and", "in", "it", "is", "was"]


def _corpus(n_per_class: int, seed: int) -> pa.Table:
    rng = random.Random(seed)
    rows = []
    i = 0
    for lbl, sig in sorted(SIG.items()):
        for _ in range(n_per_class):
            words = (rng.choices(sig, k=6)
                     + rng.choices(FILLER, k=10))
            rng.shuffle(words)
            rows.append({"doc_id": i, "lang": lbl,
                         "text": " ".join(words)})
            i += 1
    return pa.Table.from_pylist(rows)


@pytest.fixture(scope="module")
def model():
    return nb_train(rd.from_arrow(_corpus(30, seed=1)), label_col="lang")


def test_train_stats(model):
    assert sorted(model["label_stats"]) == ["bio", "code", "news"]
    assert model["n_docs"] == 90
    for n_docs, n_tok in model["label_stats"].values():
        assert n_docs == 30
        assert n_tok == 30 * 16
    # vocabulary = 3×4 signature words + 8 filler
    assert model["vocab_size"] == 20


def test_heldout_accuracy(model):
    """Distinct signature vocabularies ⇒ the held-out corpus (different
    seed) classifies perfectly."""
    test = _corpus(10, seed=2)
    out = nb_classify(rd.from_arrow(test), model).to_pandas()
    truth = test.to_pandas()[["doc_id", "lang"]]
    m = out.merge(truth, on="doc_id")
    assert len(m) == 30
    assert (m["pred"] == m["lang"]).all()


def test_plan_parity(model):
    """Broadcast and join plans are output-identical (repo invariant
    for alternate physical plans)."""
    test = rd.from_arrow(_corpus(8, seed=3))
    a = (nb_classify(test, model).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (nb_classify(test, model, broadcast_vocab_max=0,
                     num_partitions=4).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_edge_docs(model):
    """Zero-token docs are skipped; fully-OOV docs still classify (by
    prior + length closed form) — on both plans."""
    edge = pa.Table.from_pylist([
        {"doc_id": 0, "lang": "?", "text": "12345 !!!"},     # no [a-z]+
        {"doc_id": 1, "lang": "?", "text": "zzzq xxxj qqqk"},  # all OOV
        {"doc_id": 2, "lang": "?", "text": "genome protein enzyme"},
    ])
    for kw in ({}, {"broadcast_vocab_max": 0, "num_partitions": 2}):
        out = (nb_classify(rd.from_arrow(edge), model, **kw)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert out["doc_id"].tolist() == [1, 2]
        assert out.loc[1, "pred"] == "bio"
        # OOV doc: every label has equal priors and token counts here,
        # so the 9dp-rounded tie breaks label-ascending
        assert out.loc[0, "pred"] == "bio"
