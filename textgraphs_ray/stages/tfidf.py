"""TF-IDF top-terms: the classic two-pass corpus-statistics operator.

Pass 1 — document frequencies: one ``map_batches`` emits per-batch
PARTIAL (term, df) rows (terms deduped per doc first, so a term
occurring 100× in one doc contributes 1), then a single groupby-sum —
the combiner-before-shuffle pattern every aggregate here uses.

Pass 2 — scoring — has TWO physical plans, switched on the measured
vocabulary size (``broadcast_vocab_max``):

- **broadcast** (vocab ≲ 10^6 terms — natural-language vocabularies):
  the (term, idf) table ships once via ``ray.put`` and each doc scores
  against the dict lookup.  One stateless pass, no shuffle.
- **distributed** (web-corpus raw vocabularies — typos, URLs, code —
  blow past any driver bound): docs explode to (doc_id, term, tf) rows
  and hash-partition-join the vocabulary on ``term``
  (:func:`..stages.join.shuffle_join` — empty-partition-safe), then a
  per-doc group reduce emits the top-k.  The vocabulary never visits
  the driver; both sides stream through one bounded-fanout exchange.

Both plans produce byte-identical output at the 6dp rounding contract
(forced-distributed parity is pinned in tests/test_bm25.py).

Tokenization matches the engine's SQL-checkable convention
(``[a-z]+`` runs of the lowered text, like ``LangId``), and
``idf = ln((N + 1) / (df + 1))`` — smooth, positive, and expressible
verbatim in the DuckDB oracle.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Max, Sum

from .join import shuffle_join

_WORD = re.compile(r"[a-z]+")

#: above this many distinct terms the (term, stat) table stops being a
#: driver broadcast and becomes a hash-partitioned join on term
BROADCAST_VOCAB_MAX = 1_000_000


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


def _doc_term_rows(ds: "ray.data.Dataset", *, text_col: str,
                   id_col: str) -> "ray.data.Dataset":
    """Explode docs to (doc_id, term, tf, n_words) rows — the probe
    side of the distributed vocabulary join."""

    def explode(batch: pa.Table) -> pa.Table:
        out_id, out_term, out_tf, out_n = [], [], [], []
        for did, t in zip(batch.column(id_col).to_pylist(),
                          batch.column(text_col).to_pylist()):
            words = _WORD.findall((t or "").lower())
            if not words:
                continue
            cnt = Counter(words)
            n = len(words)
            for w, tf in cnt.items():
                out_id.append(did)
                out_term.append(w)
                out_tf.append(tf)
                out_n.append(n)
        return pa.table({
            "doc_id": pa.array(out_id),
            "term": pa.array(out_term, pa.string()),
            "tf": pa.array(out_tf, pa.int64()),
            "n_words": pa.array(out_n, pa.int64()),
        })

    return ds.map_batches(explode, batch_format="pyarrow")


def top_tfidf_terms(ds: "ray.data.Dataset", *, k: int = 3,
                    text_col: str = "text", id_col: str = "doc_id",
                    broadcast_vocab_max: int = BROADCAST_VOCAB_MAX,
                    num_partitions: int = 64) -> "ray.data.Dataset":
    """→ (doc_id, rank, term, tfidf): each document's top-k terms by
    tf·idf, ties broken by term asc; tfidf rounded 6dp (numpy log and
    DuckDB ln differ in the last ulp; at 6dp both sides land on the
    same decimal).

    Physical plan switches on vocabulary size — see module doc.  Force
    the distributed path in tests with ``broadcast_vocab_max=0``.
    """
    n_docs = ds.count()
    vocab = document_frequencies(ds, text_col=text_col).materialize()

    if vocab.count() <= broadcast_vocab_max:
        df_rows = vocab.take_all()
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
                tf = Counter(words)
                scored = sorted(
                    ((tfv * idf_map.get(w, 0.0), w)
                     for w, tfv in tf.items()),
                    key=lambda p: (-p[0], p[1]))[:k]
                for rank, (val, w) in enumerate(scored):
                    out_id.append(did)
                    out_rank.append(rank)
                    out_term.append(w)
                    out_val.append(round(val, 6))
            return pd.DataFrame({"doc_id": out_id, "rank": out_rank,
                                 "term": out_term, "tfidf": out_val})

        return ds.map_batches(score, batch_format="pyarrow")

    # distributed path: vocabulary too big to broadcast — join on term
    def with_idf(t: pa.Table) -> pa.Table:
        df = t.column("df").to_numpy(zero_copy_only=False)
        idf = np.log((n_docs + 1.0) / (df + 1.0))
        return pa.table({"term": t.column("term"),
                         "idf": pa.array(idf, pa.float64())})

    vocab_idf = vocab.map_batches(with_idf, batch_format="pyarrow")
    probe = _doc_term_rows(ds, text_col=text_col, id_col=id_col)
    joined = shuffle_join(
        probe, vocab_idf, "term", "term", num_partitions,
        # left join: out-of-corpus terms score idf 0.0, matching the
        # broadcast path's .get(w, 0.0)
        project=lambda m: pd.DataFrame({
            "doc_id": m["doc_id"],
            "term": m["term"],
            "val": m["tf"].to_numpy(np.float64)
            * m["idf"].fillna(0.0).to_numpy(np.float64)}),
        how="left")

    def doc_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values(["val", "term"], ascending=[False, True],
                           kind="stable").head(k).reset_index(drop=True))
        return pd.DataFrame({
            "doc_id": g["doc_id"],
            "rank": np.arange(len(g), dtype=np.int64),
            "term": g["term"],
            "tfidf": g["val"].round(6)})

    return joined.groupby("doc_id").map_groups(doc_topk,
                                               batch_format="pandas")


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
                    id_col: str = "doc_id",
                    stats_ds: "ray.data.Dataset | None" = None,
                    oov_logprob: float | None = None,
                    broadcast_vocab_max: int = BROADCAST_VOCAB_MAX,
                    num_partitions: int = 64) -> "ray.data.Dataset":
    """→ (doc_id, n_words, logprob): per-document mean unigram log
    probability under the corpus's own unigram model — the CCNet-style
    perplexity filter (documents far below the corpus mean are
    boilerplate or noise).  Same two plans as :func:`top_tfidf_terms`:
    broadcast probability lookup below ``broadcast_vocab_max`` distinct
    terms, hash-partitioned join on term above.  logprob rounded 6dp
    (numpy/DuckDB ln ulp parity).

    ``stats_ds`` trains the model on a different corpus than the one
    scored (default: same dataset).  Out-of-vocabulary words take
    ``oov_logprob`` — default ``ln(0.5 / total_tokens)``, half the
    probability mass of a singleton (Katz-style floor) — instead of
    raising.  Same-dataset scoring never hits the floor, so the oracle
    contract is unchanged."""
    vocab = term_counts(stats_ds if stats_ds is not None else ds,
                        text_col=text_col).materialize()
    total = vocab.sum("n") or 0
    if total == 0:
        return ds.map_batches(
            lambda t: pd.DataFrame({"doc_id": [], "n_words": [],
                                    "logprob": []}),
            batch_format="pyarrow")
    oov = (float(np.log(0.5 / total)) if oov_logprob is None
           else float(oov_logprob))

    if vocab.count() <= broadcast_vocab_max:
        counts = vocab.take_all()
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
                s = sum(lp.get(w, oov) for w in words)
                out_id.append(did)
                out_n.append(len(words))
                out_val.append(round(s / len(words), 6))
            return pd.DataFrame({"doc_id": out_id, "n_words": out_n,
                                 "logprob": out_val})

        return ds.map_batches(score, batch_format="pyarrow")

    # distributed path: join doc-term rows with the vocab on term
    def with_logp(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        return pa.table({"term": t.column("term"),
                         "logp": pa.array(np.log(n / total), pa.float64())})

    vocab_lp = vocab.map_batches(with_logp, batch_format="pyarrow")
    probe = _doc_term_rows(ds, text_col=text_col, id_col=id_col)
    joined = shuffle_join(
        probe, vocab_lp, "term", "term", num_partitions,
        project=lambda m: pd.DataFrame({
            "doc_id": m["doc_id"],
            "n_words": m["n_words"],
            "contrib": m["tf"].to_numpy(np.float64)
            * m["logp"].fillna(oov).to_numpy(np.float64)}),
        how="left")
    summed = (joined.groupby("doc_id")
              .aggregate(Sum("contrib", alias_name="s"),
                         Max("n_words", alias_name="n_words")))

    def finish(t: pa.Table) -> pd.DataFrame:
        s = t.column("s").to_numpy(zero_copy_only=False)
        n = t.column("n_words").to_numpy(zero_copy_only=False)
        return pd.DataFrame({
            "doc_id": t.column("doc_id").to_pandas(),
            "n_words": n.astype(np.int64),
            "logprob": np.round(s / n, 6)})

    return summed.map_batches(finish, batch_format="pyarrow")


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
    2. **score** — one stateless pass; each doc builds its term
       Counter ONCE (one pass over the tokens, not a ``list.count``
       rescan per query term), scores
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
            cnt = Counter(words)
            s = 0.0
            hit = False
            for q in terms:
                tf = cnt[q]
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
