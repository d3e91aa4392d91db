"""TF-IDF top-terms: the classic two-pass corpus-statistics operator.

Pass 1 — document frequencies: one ``map_batches`` emits per-batch
PARTIAL (term, df) rows (terms deduped per doc first, so a term
occurring 100× in one doc contributes 1), then a single groupby-sum —
the combiner-before-shuffle pattern every aggregate here uses.  The
resulting vocabulary table is broadcast via ``ray.put`` when it fits
(≲10^7 terms — true for natural-language vocabularies even at corpus
scale); beyond that it becomes a hash-partitioned join on term, same
as any big-side lookup.

Pass 2 — scoring: one ``map_batches`` per doc computes tf, looks idf
up in the broadcast dict, and emits the top-k terms with a
deterministic tie-break (score desc, term asc).

Tokenization matches the engine's SQL-checkable convention
(``[a-z]+`` runs of the lowered text, like ``LangId``), and
``idf = ln((N + 1) / (df + 1))`` — smooth, positive, and expressible
verbatim in the DuckDB oracle.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Sum

_WORD = re.compile(r"[a-z]+")


def document_frequencies(ds: "ray.data.Dataset", *,
                         text_col: str = "text") -> "ray.data.Dataset":
    """→ (term, df) — number of documents containing each term."""

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for t in batch.column(text_col).to_pylist():
            for w in set(_WORD.findall((t or "").lower())):
                counts[w] = counts.get(w, 0) + 1
        return pa.table({
            "term": pa.array(list(counts.keys()), pa.string()),
            "df": pa.array(list(counts.values()), pa.int64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("term").aggregate(Sum("df", alias_name="df")))


def top_tfidf_terms(ds: "ray.data.Dataset", *, k: int = 3,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> "ray.data.Dataset":
    """→ (doc_id, rank, term, tfidf): each document's top-k terms by
    tf·idf, ties broken by term asc; tfidf is the raw double."""
    n_docs = ds.count()
    df_rows = document_frequencies(ds, text_col=text_col).take_all()
    idf = {r["term"]: float(np.log((n_docs + 1) / (r["df"] + 1)))
           for r in df_rows}
    idf_ref = ray.put(idf)

    def score(batch: pa.Table) -> pd.DataFrame:
        idf_map = ray.get(idf_ref)
        out_id, out_rank, out_term, out_val = [], [], [], []
        for did, t in zip(batch.column(id_col).to_pylist(),
                          batch.column(text_col).to_pylist()):
            words = _WORD.findall((t or "").lower())
            if not words:
                continue
            tf: dict[str, int] = {}
            for w in words:
                tf[w] = tf.get(w, 0) + 1
            scored = sorted(
                ((tfv * idf_map.get(w, 0.0), w) for w, tfv in tf.items()),
                key=lambda p: (-p[0], p[1]))[:k]
            for rank, (val, w) in enumerate(scored):
                out_id.append(did)
                out_rank.append(rank)
                out_term.append(w)
                # round 6dp: numpy log and DuckDB ln differ in the
                # last ulp (~13% of values, measured), so raw doubles
                # would repr-mismatch; at 6dp both sides land on the
                # same decimal except at astronomically unlikely exact
                # rounding boundaries
                out_val.append(round(val, 6))
        return pd.DataFrame({"doc_id": out_id, "rank": out_rank,
                             "term": out_term, "tfidf": out_val})

    return ds.map_batches(score, batch_format="pyarrow")


def term_counts(ds: "ray.data.Dataset", *,
                text_col: str = "text") -> "ray.data.Dataset":
    """→ (term, n) — total corpus occurrences of each term."""

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for t in batch.column(text_col).to_pylist():
            for w in _WORD.findall((t or "").lower()):
                counts[w] = counts.get(w, 0) + 1
        return pa.table({
            "term": pa.array(list(counts.keys()), pa.string()),
            "n": pa.array(list(counts.values()), pa.int64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("term").aggregate(Sum("n", alias_name="n")))


def unigram_logprob(ds: "ray.data.Dataset", *, text_col: str = "text",
                    id_col: str = "doc_id") -> "ray.data.Dataset":
    """→ (doc_id, n_words, logprob): per-document mean unigram log
    probability under the corpus's own unigram model — the CCNet-style
    perplexity filter (documents far below the corpus mean are
    boilerplate or noise).  Same two-pass shape as TF-IDF: one
    combiner-fed term-count groupby, then a broadcast probability
    lookup; logprob rounded 6dp (numpy/DuckDB ln ulp parity)."""
    counts = term_counts(ds, text_col=text_col).take_all()
    total = float(sum(r["n"] for r in counts))
    logp = {r["term"]: float(np.log(r["n"] / total)) for r in counts}
    ref = ray.put(logp)

    def score(batch: pa.Table) -> pd.DataFrame:
        lp = ray.get(ref)
        out_id, out_n, out_val = [], [], []
        for did, t in zip(batch.column(id_col).to_pylist(),
                          batch.column(text_col).to_pylist()):
            words = _WORD.findall((t or "").lower())
            if not words:
                continue
            s = sum(lp[w] for w in words)  # every word is in-corpus
            out_id.append(did)
            out_n.append(len(words))
            out_val.append(round(s / len(words), 6))
        return pd.DataFrame({"doc_id": out_id, "n_words": out_n,
                             "logprob": out_val})

    return ds.map_batches(score, batch_format="pyarrow")
