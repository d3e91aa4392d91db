"""Exact set-similarity JOIN — AllPairs/PPJoin-style prefix filtering.

Joins two document datasets on token-shingle Jaccard ≥ τ with EXACT
recall (unlike the banded-LSH dedup family in ``stages/dedup.py``,
whose candidate generation is probabilistic and therefore only
hash-verifiable against SQL at threshold 1.0).  The classic
prefix-filter guarantee (Bayardo et al., "Scaling Up All Pairs
Similarity Search", WWW'07; Xiao et al. PPJoin, WWW'08 — public
algorithms) makes every τ oracle-checkable:

  order all shingles by a global total order (rarity-first: ascending
  (df, term)); if J(x, y) ≥ τ then the order-minimum element z of
  x ∩ y sits within the first |x| − ⌈τ·|x|⌉ + 1 elements of x AND the
  first |y| − ⌈τ·|y|⌉ + 1 elements of y (every element of x before z
  is, by z's minimality, outside the intersection, and there are at
  most |x| − ⌈τ·|x|⌉ of those).  Grouping by prefix tokens therefore
  finds every qualifying pair at least once; emitting a pair only from
  the group of its order-minimum shared prefix token makes the output
  exactly-once without a separate pair-dedup shuffle.

Physical plan (mirrors ``stages/tfidf.py``'s vocabulary switch):

1. tag + shingle both sides (stateless ``map_batches``; distinct word
   ``n``-grams of the ``[a-z]+``-lowered text — whole-token sets are
   degenerate on small vocabularies, shingles are the standard
   similarity-join element);
2. shingle document frequencies over the UNION of both sides
   (per-batch partial counts → one groupby — combiner-first);
3. rarity order: **broadcast** the (shingle → df) map when the
   vocabulary is ≤ ``broadcast_vocab_max`` (one ``ray.put``, read per
   actor), else the **join** plan: explode to (doc, shingle) rows,
   hash-partition ``shuffle_join`` on shingle, regroup per doc — the
   vocabulary never visits the driver (forced with
   ``broadcast_vocab_max=0``; both plans are output-identical and the
   forced plan shares the oracle — repo invariant);
4. per doc emit one row per PREFIX shingle (the payload carries the
   doc's full sorted shingle list — prefix length × set size per doc,
   the price every prefix-filter join pays; at low τ prefixes approach
   the whole set, which is intrinsic to low-τ joins, not this plan);
5. ``groupby(prefix shingle)`` → within each group verify A×B
   candidates exactly (set intersection) and emit only from the
   canonical group.  Prefix shingles are each doc's RAREST, so group
   fanout is self-limiting; a pathological hot shingle can be salted
   with the segmented cap in ``stages/blocking.py`` if ever observed.

No counterpart in the reference engine (DerwenAI/textgraphs) — this is
one of the beyond-reference LLM-curation operators (cross-corpus
near-duplicate linking, e.g. train-vs-eval overlap at pair level).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Sum

from .join import shuffle_join

_WORD = re.compile(r"[a-z]+")

#: above this many distinct shingles the rarity order stops being a
#: driver broadcast and becomes a hash-partitioned join on shingle
BROADCAST_VOCAB_MAX = 1_000_000

def _shingle_set(text: str | None, n: int) -> list[str]:
    """Distinct word ``n``-gram shingles (SQL-replayable convention:
    ``[a-z]+`` runs of the lowered text, space-joined windows)."""
    words = _WORD.findall((text or "").lower())
    if len(words) < n:
        return []
    return list({" ".join(words[i:i + n])
                 for i in range(len(words) - n + 1)})


def _min_overlap(nt: int, tau: float, measure: str) -> float:
    """Measure-specific lower bound on |x ∩ y| given |x| = nt and
    sim ≥ tau (each derived with |y| ≥ |x ∩ y|):

      jaccard  i/(nx+ny−i) ≥ τ  ⟹  i ≥ τ·nx
      cosine   i/√(nx·ny)  ≥ τ  ⟹  i ≥ τ²·nx
      dice     2i/(nx+ny)  ≥ τ  ⟹  i ≥ τ·nx/(2−τ)
    """
    if measure == "jaccard":
        return tau * nt
    if measure == "cosine":
        return tau * tau * nt
    if measure == "dice":
        return tau * nt / (2.0 - tau)
    raise ValueError(f"unknown measure {measure!r}")


def _sim_value(inter: int, nx: int, ny: int, measure: str) -> float:
    """The similarity as the SAME IEEE expression the SQL oracle
    computes — every operand is an exact small integer, so the one
    division (and sqrt) is bit-identical on both sides regardless of
    evaluation order."""
    if measure == "jaccard":
        return inter / (nx + ny - inter)
    if measure == "cosine":
        return inter / float(np.sqrt(float(nx * ny)))
    return (2 * inter) / (nx + ny)


def _prefix_len(nt: int, tau: float, measure: str = "jaccard") -> int:
    # smallest prefix that must contain the order-min intersection
    # element: nt - ceil(min_overlap) + 1.  The 1e-9 keeps float ceil
    # from rounding an exact integer product UP (which would SHRINK
    # the prefix and break exact recall).
    return nt - int(np.ceil(_min_overlap(nt, tau, measure) - 1e-9)) + 1


def _tagged(ds, *, id_col: str, text_col: str, n: int, side: int):
    """→ (side, _id, toks) rows: one per doc with a non-empty
    shingle set."""

    def tag(t: pa.Table) -> pa.Table:
        ids, toks = [], []
        for did, txt in zip(t.column(id_col).to_pylist(),
                            t.column(text_col).to_pylist()):
            s = _shingle_set(txt, n)
            if s:
                ids.append(did)
                toks.append(s)
        return pa.table({
            "side": pa.array(np.full(len(ids), side, np.int8)),
            "_id": pa.array(ids, t.schema.field(id_col).type),
            "toks": pa.array(toks, pa.list_(pa.string())),
        })

    return ds.map_batches(tag, batch_format="pyarrow")


def _shingle_frequencies(tagged) -> "ray.data.Dataset":
    """→ (term, df) over the union of both sides (combiner-first)."""

    def partial(t: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for toks in t.column("toks").to_pylist():
            for g in toks:
                counts[g] = counts.get(g, 0) + 1
        return pa.table({
            "term": pa.array(list(counts.keys()), pa.string()),
            "df": pa.array(list(counts.values()), pa.int64()),
        })

    return (tagged.map_batches(partial, batch_format="pyarrow")
            .groupby("term").aggregate(Sum("df", alias_name="df")))


def _prefix_rows_table(sides, ids, sorted_toks, id_type,
                       tau: float,
                       measure: str = "jaccard") -> pa.Table:
    """Emit one row per prefix shingle of each doc (shared by both
    rarity-order plans)."""
    out_tok, out_side, out_id, out_plen, out_toks = [], [], [], [], []
    for side, did, toks in zip(sides, ids, sorted_toks):
        plen = _prefix_len(len(toks), tau, measure)
        for g in toks[:plen]:
            out_tok.append(g)
            out_side.append(side)
            out_id.append(did)
            out_plen.append(plen)
            out_toks.append(toks)
    return pa.table({
        "tok": pa.array(out_tok, pa.string()),
        "side": pa.array(out_side, pa.int8()),
        "plen": pa.array(out_plen, pa.int64()),
        "toks": pa.array(out_toks, pa.list_(pa.string())),
        "_id": pa.array(out_id, id_type),
    })


def set_similarity_join(left: "ray.data.Dataset",
                        right: "ray.data.Dataset", *, tau: float,
                        n: int = 3, text_col: str = "text",
                        id_col: str = "doc_id",
                        broadcast_vocab_max: int = BROADCAST_VOCAB_MAX,
                        num_partitions: int = 64,
                        measure: str = "jaccard") -> "ray.data.Dataset":
    """→ (a_id, b_id, <measure>): every cross-dataset pair whose
    distinct word-``n``-gram shingle sets have similarity ≥ ``tau``
    under ``measure`` ∈ {jaccard, cosine, dice} — EXACT (recall 1 by
    the measure's prefix-filter bound; see ``_min_overlap``).

    The value column (named after the measure) is the raw double of
    the measure's one division over exact integers — the same IEEE
    expression the SQL oracle computes, so ``>= tau`` decides
    identically on both sides.  Both id columns must share one Arrow
    type.
    """
    if not 0.0 < tau <= 1.0:
        raise ValueError(f"tau must be in (0, 1], got {tau}")
    _min_overlap(1, tau, measure)  # validate measure name
    lschema = left.schema()
    if lschema is None or right.schema() is None:
        return ray.data.from_arrow(pa.schema(
            [("a_id", pa.int64()), ("b_id", pa.int64()),
             (measure, pa.float64())]).empty_table())
    id_type = dict(zip(lschema.names, lschema.types))[id_col]
    # pin ONCE: tagged feeds both the df aggregate and the prefix
    # emission — an unpinned lazy stream would re-run the shingling
    # pass per consumer (repo invariant; see the r2 minhash regression)
    tagged = _tagged(left, id_col=id_col, text_col=text_col, n=n,
                     side=0).union(
        _tagged(right, id_col=id_col, text_col=text_col, n=n,
                side=1)).materialize()
    vocab = _shingle_frequencies(tagged).materialize()

    if vocab.count() <= broadcast_vocab_max:
        df_map = {r["term"]: r["df"] for r in vocab.take_all()}
        df_ref = ray.put(df_map)

        def emit(t: pa.Table) -> pa.Table:
            dfm = ray.get(df_ref)
            sorted_toks = [sorted(toks, key=lambda g: (dfm[g], g))
                           for toks in t.column("toks").to_pylist()]
            return _prefix_rows_table(
                t.column("side").to_pylist(), t.column("_id").to_pylist(),
                sorted_toks, id_type, tau, measure)

        prefix = tagged.map_batches(emit, batch_format="pyarrow")
    else:
        # join plan: the shingle vocabulary never visits the driver
        def explode(t: pa.Table) -> pa.Table:
            gid, side, did, term = [], [], [], []
            for s, d, toks in zip(t.column("side").to_pylist(),
                                  t.column("_id").to_pylist(),
                                  t.column("toks").to_pylist()):
                g = f"{s}|{d}"
                for tok in toks:
                    gid.append(g)
                    side.append(s)
                    did.append(d)
                    term.append(tok)
            return pa.table({
                "_gid": pa.array(gid, pa.string()),
                "side": pa.array(side, pa.int8()),
                "_id": pa.array(did, id_type),
                "term": pa.array(term, pa.string()),
            })

        rows = tagged.map_batches(explode, batch_format="pyarrow")
        joined = shuffle_join(rows, vocab, "term", "term",
                              num_partitions)

        def rebuild(g: pd.DataFrame) -> pa.Table:
            order = sorted(zip(g["df"], g["term"]))
            return _prefix_rows_table(
                [np.int8(g["side"].iloc[0])], [g["_id"].iloc[0]],
                [[t for _, t in order]], id_type, tau, measure)

        prefix = joined.groupby("_gid").map_groups(
            rebuild, batch_format="pandas")

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        key = g["tok"].iloc[0]
        a = g[g["side"] == 0]
        b = g[g["side"] == 1]
        out_a, out_b, out_j = [], [], []
        if len(a) and len(b):
            b_rows = [(rid, frozenset(toks), frozenset(toks[:pl]))
                      for rid, toks, pl in zip(b["_id"], b["toks"],
                                               b["plen"])]
            for rid_a, toks_a, pl_a in zip(a["_id"], a["toks"],
                                           a["plen"]):
                fs_a = frozenset(toks_a)
                pre_a = list(toks_a[:pl_a])
                for rid_b, fs_b, pre_b in b_rows:
                    inter = len(fs_a & fs_b)
                    if not inter:
                        continue
                    jac = _sim_value(inter, len(fs_a), len(fs_b),
                                     measure)
                    if jac < tau:
                        continue
                    # exactly-once: only the group of the order-min
                    # shared PREFIX shingle emits this pair (pre_a is
                    # globally rarity-sorted, so the first hit is min)
                    if next(t for t in pre_a if t in pre_b) == key:
                        out_a.append(rid_a)
                        out_b.append(rid_b)
                        out_j.append(jac)
        id_dtype = g["_id"].dtype
        return pd.DataFrame({
            "a_id": pd.Series(out_a, dtype=id_dtype),
            "b_id": pd.Series(out_b, dtype=id_dtype),
            measure: pd.Series(out_j, dtype=np.float64)})

    return prefix.groupby("tok").map_groups(verify,
                                            batch_format="pandas")


def set_containment_join(left: "ray.data.Dataset",
                         right: "ray.data.Dataset", *,
                         text_col: str = "text",
                         id_col: str = "doc_id",
                         num_partitions: int = 64
                         ) -> "ray.data.Dataset":
    """→ (a_id, b_id): every cross-dataset pair where the LEFT doc's
    non-empty distinct-word set is a SUBSET of the right doc's —
    exact set-containment join (the Q⊆D primitive behind template
    detection, query subsumption and boilerplate provenance).

    Physical plan — rarest-token blocking (the classic containment
    bound, cf. PIEJoin/TT-Join literature, all public):

    1. distinct ``[a-z]+`` word sets per side (stateless);
    2. right-side token document frequencies (combiner → one groupby),
       broadcast once via ``ray.put`` — the (token, df) map is
       vocabulary-sized; above ~10^7 terms route it through
       ``stages/join.py shuffle_join`` on token instead (the
       ``stages/tfidf.py`` switch pattern);
    3. each left doc emits ONE row keyed by its (df, token)-minimum
       token t*; any superset must contain t*, so the pair meets in
       exactly one group (exactly-once, no pair-dedup shuffle) and
       the candidate count is Σ_a df(t*) — a's rarest token has the
       SMALLEST posting list, the self-limiting property.  A left doc
       with a zero-df token is contained in nothing and is dropped
       before the shuffle;
    4. right side explodes to payload-free (token, b_id) postings;
       candidates pick up the right word set through ONE
       empty-partition-safe ``shuffle_join`` on b_id, then verify
       ``set(a) ⊆ set(b)`` in place.
    """
    out_schema = pa.schema([("a_id", pa.int64()), ("b_id", pa.int64())])
    if left.schema() is None or right.schema() is None:
        return ray.data.from_arrow(out_schema.empty_table())

    def word_sets(t: pa.Table, keep_empty: bool) -> pa.Table:
        ids, toks = [], []
        for did, txt in zip(t.column(id_col).to_pylist(),
                            t.column(text_col).to_pylist()):
            s = sorted(set(_WORD.findall((txt or "").lower())))
            if s or keep_empty:
                ids.append(did)
                toks.append(s)
        return pa.table({"_id": pa.array(ids, pa.int64()),
                         "toks": pa.array(toks, pa.list_(pa.string()))})

    a_sets = left.map_batches(
        lambda t: word_sets(t, keep_empty=False),
        batch_format="pyarrow").materialize()
    b_sets = right.map_batches(
        lambda t: word_sets(t, keep_empty=False),
        batch_format="pyarrow").materialize()

    def b_partial_df(t: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for toks in t.column("toks").to_pylist():
            for w in toks:
                counts[w] = counts.get(w, 0) + 1
        return pa.table({"term": pa.array(list(counts), pa.string()),
                         "df": pa.array(list(counts.values()),
                                        pa.int64())})

    vocab = (b_sets.map_batches(b_partial_df, batch_format="pyarrow")
             .groupby("term").aggregate(Sum("df", alias_name="df")))
    if vocab.schema() is None or not vocab.schema().names:
        return ray.data.from_arrow(out_schema.empty_table())
    df_ref = ray.put({r["term"]: r["df"] for r in vocab.take_all()})

    def a_min_token(t: pa.Table) -> pa.Table:
        dfm = ray.get(df_ref)
        tok, aid, toks_out = [], [], []
        for did, toks in zip(t.column("_id").to_pylist(),
                             t.column("toks").to_pylist()):
            key = min(((dfm.get(w, 0), w) for w in toks))
            if key[0] == 0:
                continue          # some word absent from every b doc
            tok.append(key[1])
            aid.append(did)
            toks_out.append(toks)
        return pa.table({
            "tok": pa.array(tok, pa.string()),
            "side": pa.array(np.zeros(len(tok), np.int8)),
            "_id": pa.array(aid, pa.int64()),
            "toks": pa.array(toks_out, pa.list_(pa.string()))})

    def b_postings(t: pa.Table) -> pa.Table:
        tok, bid = [], []
        for did, toks in zip(t.column("_id").to_pylist(),
                             t.column("toks").to_pylist()):
            for w in toks:
                tok.append(w)
                bid.append(did)
        empty_toks = pa.array([None] * len(tok), pa.list_(pa.string()))
        return pa.table({
            "tok": pa.array(tok, pa.string()),
            "side": pa.array(np.ones(len(tok), np.int8)),
            "_id": pa.array(bid, pa.int64()),
            "toks": empty_toks})

    stream = a_sets.map_batches(a_min_token,
                                batch_format="pyarrow").union(
        b_sets.map_batches(b_postings, batch_format="pyarrow"))

    def candidates(g: pd.DataFrame) -> pa.Table:
        a = g[g["side"] == 0]
        b = g[g["side"] == 1]
        out_a, out_b, out_t = [], [], []
        for aid, toks in zip(a["_id"], a["toks"]):
            for bid in b["_id"]:
                out_a.append(aid)
                out_b.append(bid)
                out_t.append(list(toks))
        return pa.table({
            "a_id": pa.array(out_a, pa.int64()),
            "b_id": pa.array(out_b, pa.int64()),
            "a_toks": pa.array(out_t, pa.list_(pa.string()))})

    cands = stream.groupby("tok").map_groups(candidates,
                                             batch_format="pandas")
    if cands.schema() is None or not cands.schema().names:
        return ray.data.from_arrow(out_schema.empty_table())
    joined = shuffle_join(cands, b_sets, "b_id", "_id", num_partitions)
    if joined.schema() is None or not joined.schema().names:
        return ray.data.from_arrow(out_schema.empty_table())

    def verify(t: pa.Table) -> pa.Table:
        out_a, out_b = [], []
        for aid, bid, at, bt in zip(t.column("a_id").to_pylist(),
                                    t.column("b_id").to_pylist(),
                                    t.column("a_toks").to_pylist(),
                                    t.column("toks").to_pylist()):
            if set(at) <= set(bt or []):
                out_a.append(aid)
                out_b.append(bid)
        return pa.table({"a_id": pa.array(out_a, pa.int64()),
                         "b_id": pa.array(out_b, pa.int64())})

    out = joined.map_batches(verify, batch_format="pyarrow")
    if out.schema() is None or not out.schema().names:
        return ray.data.from_arrow(out_schema.empty_table())
    return out
