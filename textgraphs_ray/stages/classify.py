"""Distributed multinomial Naive Bayes over document text.

The trainable-classifier step of an LLM curation pipeline (quality /
language / domain routing — the role fastText plays in CCNet and
RefinedWeb).  No counterpart in the reference engine
(DerwenAI/textgraphs); this extends SURVEY.md §2's inventory on the
training-data side like ``stages/tfidf.py``.  Naive Bayes is the one
classic text classifier whose TRAINING is exactly a counting
aggregate, so the whole fit runs as the engine's standard
combiner-first groupby — no SGD, no parameter server, bit-reproducible
across cluster sizes, and every score is replayable in ANSI SQL for
the oracle gate.

Model (Laplace-smoothed multinomial NB):

  score(d, l) = ln P(l) + Σ_w tf_w · ln((c(l,w) + 1) / (n_tok(l) + V))

with V the training vocabulary size.  Rearranged as

  score(d, l) = ln P(l) − N_d · ln(n_tok(l) + V) + Σ_w tf_w · ln(c(l,w)+1)

every (label, term) pair ABSENT from the training counts contributes
``ln(0 + 1) = 0`` — so the sparse count table IS the model; no dense
vocabulary ever exists.  That identity drives both physical plans:

* **broadcast** (count table ≤ ``broadcast_vocab_max`` rows): the
  (term → per-label count) dict ships once via ``ray.put``; scoring is
  one stateless ``map_batches`` pass.
* **join** (web-scale raw vocabularies): docs explode to
  (doc_id, term, tf, n_words) rows and LEFT hash-partition-join the
  count table on term (``stages/join.shuffle_join`` — empty-partition-
  safe); a per-doc group reduce folds the per-label partial sums and
  applies the closed-form ``prior − N_d·ln(n_tok+V)`` from the tiny
  label-stats table.  OOV terms survive the left join as null-label
  rows (contribution 0) so fully-OOV documents still classify by
  prior + length.  The vocabulary never visits the driver.

Both plans are output-identical (repo invariant: the forced-plan query
shares the default plan's oracle + a parity test).  Ties in the argmax
break label-ascending on scores rounded to 9dp — the same rounding the
SQL oracle applies, so the decision is IEEE-stable on both sides
(cross-label margins are O(1); 9dp only collapses last-ulp sum-order
noise).

Tokenization matches the engine's SQL-checkable convention
(``[a-z]+`` runs of the lowered text — ``regexp_extract_all`` in
DuckDB); documents with zero tokens are skipped on both sides.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Sum

from .join import shuffle_join
from .tfidf import _WORD, _doc_term_rows

#: above this many (label, term) count rows the model stops being a
#: driver broadcast and becomes a hash-partitioned join on term
BROADCAST_VOCAB_MAX = 1_000_000

#: label-stats sentinel in the unified training aggregate ("" can never
#: be a real ``[a-z]+`` token, and Ray groupby keys stay non-null)
_STATS = ""


def nb_train(ds: "ray.data.Dataset", *, label_col: str = "lang",
             text_col: str = "text") -> dict:
    """Fit the NB model → ``{"term_counts": Dataset(label, term, c),
    "label_stats": {label: (n_docs, n_tokens)}, "vocab_size": int,
    "n_docs": int}``.

    ``term_counts`` stays a (potentially huge) pinned Dataset;
    ``label_stats`` is one tiny dict (L entries).  Everything is
    combiner-first: per-batch partial counts, then ONE groupby-sum
    shuffle carrying both the (label, term) counts and the per-label
    doc/token totals (sentinel term rows); the vocabulary size comes
    from a distributed distinct-count, never a driver list.
    """

    def partial(t: pa.Table) -> pa.Table:
        counts: dict = {}
        docs: dict = {}
        toks: dict = {}
        for lbl, txt in zip(t.column(label_col).to_pylist(),
                            t.column(text_col).to_pylist()):
            words = _WORD.findall((txt or "").lower())
            docs[lbl] = docs.get(lbl, 0) + 1
            toks[lbl] = toks.get(lbl, 0) + len(words)
            for w in words:
                counts[(lbl, w)] = counts.get((lbl, w), 0) + 1
        keys = list(counts.keys())
        return pa.table({
            "label": pa.array(
                [k[0] for k in keys] + list(docs.keys()), pa.string()),
            "term": pa.array(
                [k[1] for k in keys] + [_STATS] * len(docs),
                pa.string()),
            "c": pa.array(
                list(counts.values()) + [0] * len(docs), pa.int64()),
            "n_docs": pa.array(
                [0] * len(keys) + list(docs.values()), pa.int64()),
            "n_tokens": pa.array(
                [0] * len(keys) + [toks[l] for l in docs], pa.int64()),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["label", "term"])
           .aggregate(Sum("c", alias_name="c"),
                      Sum("n_docs", alias_name="n_docs"),
                      Sum("n_tokens", alias_name="n_tokens"))
           .materialize())  # consumed 3× below — pin once

    import pyarrow.compute as pc

    stats_rows = agg.map_batches(
        lambda t: t.filter(pc.equal(t.column("term"), _STATS)),
        batch_format="pyarrow").take_all()
    label_stats = {r["label"]: (r["n_docs"], r["n_tokens"])
                   for r in stats_rows}
    term_counts = agg.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("term"), _STATS))
        .select(["label", "term", "c"]),
        batch_format="pyarrow").materialize()
    # distinct-term count: small groupby result, scalar to the driver
    vocab_size = (term_counts.select_columns(["term"])
                  .groupby("term").count().count())
    return {
        "term_counts": term_counts,
        "label_stats": label_stats,
        "vocab_size": vocab_size,
        "n_docs": sum(d for d, _ in label_stats.values()),
    }


def _label_terms(model: dict) -> tuple:
    """Per-label closed-form pieces: (labels sorted asc, ln prior,
    ln(n_tok + V)) as aligned numpy arrays."""
    labels = sorted(model["label_stats"])
    n_docs = np.array([model["label_stats"][l][0] for l in labels],
                      dtype=np.float64)
    n_tok = np.array([model["label_stats"][l][1] for l in labels],
                     dtype=np.float64)
    prior = np.log(n_docs / model["n_docs"])
    denom = np.log(n_tok + model["vocab_size"])
    return labels, prior, denom


def _argmax_label(labels: list, scores: np.ndarray) -> str:
    """Tie-stable argmax: scores rounded 9dp, ties → label asc (labels
    are pre-sorted asc; ``np.argmax`` takes the first maximum)."""
    return labels[int(np.argmax(np.round(scores, 9)))]


def nb_classify(ds: "ray.data.Dataset", model: dict, *,
                text_col: str = "text", id_col: str = "doc_id",
                broadcast_vocab_max: int = BROADCAST_VOCAB_MAX,
                num_partitions: int = 64) -> "ray.data.Dataset":
    """→ (doc_id, pred): the argmax NB label per document (docs with
    zero ``[a-z]+`` tokens are skipped).  Physical plan switches on the
    count-table size — see module doc; force the join plan in tests
    with ``broadcast_vocab_max=0``."""
    labels, prior, denom = _label_terms(model)
    lbl_idx = {l: i for i, l in enumerate(labels)}
    term_counts = model["term_counts"]
    id_type = dict(zip(ds.schema().names, ds.schema().types))[id_col]

    if term_counts.count() <= broadcast_vocab_max:
        lut: dict = {}
        for r in term_counts.take_all():
            lut.setdefault(r["term"], {})[r["label"]] = r["c"]
        lut_ref = ray.put(lut)

        def score(t: pa.Table) -> pa.Table:
            m = ray.get(lut_ref)
            out_id, out_pred = [], []
            for did, txt in zip(t.column(id_col).to_pylist(),
                                t.column(text_col).to_pylist()):
                words = _WORD.findall((txt or "").lower())
                if not words:
                    continue
                s = prior - len(words) * denom
                for w, tf in Counter(words).items():
                    per = m.get(w)
                    if per:
                        for lbl, c in per.items():
                            s[lbl_idx[lbl]] += tf * np.log(c + 1.0)
                out_id.append(did)
                out_pred.append(_argmax_label(labels, s))
            return pa.table({
                "doc_id": pa.array(out_id, id_type),
                "pred": pa.array(out_pred, pa.string())})

        return ds.map_batches(score, batch_format="pyarrow")

    # join plan: LEFT join doc-term rows with the sparse count table on
    # term; one row per (doc, term, matching label) + null-label rows
    # for OOV terms (keeps fully-OOV docs alive through the reduce)
    probe = _doc_term_rows(ds, text_col=text_col, id_col=id_col)
    joined = shuffle_join(
        probe, term_counts, "term", "term", num_partitions,
        project=lambda m: pd.DataFrame({
            "doc_id": m["doc_id"],
            "n_words": m["n_words"],
            "label": m["label"],
            "contrib": m["tf"].to_numpy(np.float64)
            * np.log(m["c"].to_numpy(dtype=np.float64, na_value=0.0)
                     + 1.0)}),
        how="left")

    def doc_pred(g: pd.DataFrame) -> pd.DataFrame:
        nd = float(g["n_words"].iloc[0])
        s = prior - nd * denom
        per = g.dropna(subset=["label"]).groupby("label")["contrib"].sum()
        for lbl, v in per.items():
            s[lbl_idx[lbl]] += v
        return pd.DataFrame({
            "doc_id": pd.Series([g["doc_id"].iloc[0]],
                                dtype=g["doc_id"].dtype),
            "pred": [_argmax_label(labels, s)]})

    return joined.groupby("doc_id").map_groups(doc_pred,
                                               batch_format="pandas")
