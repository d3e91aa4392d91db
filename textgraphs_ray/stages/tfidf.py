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


def bm25_topk(ds: "ray.data.Dataset", query_terms: list, *, k: int = 10,
              k1: float = 1.2, b: float = 0.75, text_col: str = "text",
              id_col: str = "doc_id") -> pd.DataFrame:
    """Top-k documents for a term query under BM25 (Robertson et al.,
    the Okapi weighting every lexical retrieval stack uses) →
    DataFrame (doc_id, score), score desc / doc_id asc.

    Two passes, both embarrassingly parallel:

    1. **corpus stats** — one ``map_batches`` emits a single partial
       row per block: doc count, total token count, and per-query-term
       document frequencies (only the handful of query terms is
       counted — never a full vocabulary shuffle).  Driver folds the
       ≤ #blocks tiny rows.
    2. **score** — one stateless pass; each doc computes tf for the
       query terms + its own length, scores
       ``idf·tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl))`` and emits only
       matching docs, pre-truncated to the block-local top-k, so the
       driver merge sees ≤ blocks·k rows.

    ``idf = ln((N - df + 0.5)/(df + 0.5) + 1)`` — the standard
    non-negative smooth, expressible verbatim in the DuckDB oracle
    (``bm25_topk``); scores round to 6dp on both sides (same last-ulp
    argument as ``tfidf_topk``)."""
    terms = sorted(set(query_terms))

    def stats(batch: pa.Table) -> pa.Table:
        n, total_dl = 0, 0
        df = dict.fromkeys(terms, 0)
        for t in batch.column(text_col).to_pylist():
            words = _WORD.findall((t or "").lower())
            n += 1
            total_dl += len(words)
            ws = set(words)
            for q in terms:
                if q in ws:
                    df[q] += 1
        cols = {"n": pa.array([n], pa.int64()),
                "sum_dl": pa.array([total_dl], pa.int64())}
        for i, q in enumerate(terms):
            cols[f"df_{i}"] = pa.array([df[q]], pa.int64())
        return pa.table(cols)

    agg = ds.map_batches(stats, batch_format="pyarrow").to_pandas()
    # an empty dataset yields zero stat rows (no columns at all)
    n_docs = int(agg["n"].sum()) if "n" in agg.columns else 0
    if n_docs == 0:
        return pd.DataFrame({id_col: pd.Series([], dtype="object"),
                             "score": pd.Series([], dtype="float64")})
    avgdl = float(agg["sum_dl"].sum()) / n_docs
    idf = {q: float(np.log((n_docs - int(agg[f"df_{i}"].sum()) + 0.5)
                           / (int(agg[f"df_{i}"].sum()) + 0.5) + 1.0))
           for i, q in enumerate(terms)}

    def score(batch: pa.Table) -> pd.DataFrame:
        out_id, out_s = [], []
        for did, t in zip(batch.column(id_col).to_pylist(),
                          batch.column(text_col).to_pylist()):
            words = _WORD.findall((t or "").lower())
            if not words:
                continue
            dl = len(words)
            s = 0.0
            hit = False
            for q in terms:
                tf = words.count(q)
                if tf:
                    hit = True
                    s += (idf[q] * tf * (k1 + 1.0)
                          / (tf + k1 * (1.0 - b + b * dl / avgdl)))
            if hit:
                out_id.append(did)
                out_s.append(s)
        part = pd.DataFrame({id_col: out_id, "score": out_s})
        return part.sort_values(["score", id_col],
                                ascending=[False, True]).head(k)

    merged = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    if merged.empty:
        return pd.DataFrame({id_col: pd.Series([], dtype="object"),
                             "score": pd.Series([], dtype="float64")})
    top = (merged.sort_values(["score", id_col],
                              ascending=[False, True], kind="stable")
           .head(k).reset_index(drop=True))
    top["score"] = top["score"].astype("float64").round(6)
    return top
