"""Edit-distance self-JOIN — FastSS deletion-neighborhood blocking.

Finds every pair of rows whose string keys are within Levenshtein
distance ``k`` — EXACT (both recall and the reported distance), unlike
the banded-LSH families in ``stages/dedup.py``.  Built on the FastSS
guarantee (Bocek/Hunt/Stiller, "Fast Similarity Search in Large
Dictionaries", TIK report 2007 — public algorithm):

  ED(s, t) ≤ k  ⟹  D_k(s) ∩ D_k(t) ≠ ∅

where ``D_k(s)`` is the set of strings obtainable from ``s`` by
deleting at most ``k`` characters.  So grouping rows by deletion
variant finds every qualifying pair at least once; an exact banded
Levenshtein verify inside each group removes false candidates
(variant-sharing only bounds ED by 2k, and the 64-bit variant hash can
collide — both only ADD candidates, never drop pairs); one final
(id_a, id_b) groupby collapses pairs found via several shared variants.

Physical plan / scale notes:

1. stateless ``map_batches``: each string emits its ≤ Σ C(L, i) ≤ L^k
   distinct deletion variants as (variant-hash, id, string) rows —
   only 64-bit hashes and the (short) key string ride the shuffle,
   never a document payload.  O(kL) emission per row is the price
   FastSS pays for exactness; for long keys, block on a bounded
   normalized prefix instead (this operator targets NAME-length keys,
   the record-linkage case).
2. ``groupby(variant hash)`` → within-group i<j candidate pairs,
   verified IN PLACE with an early-exit O(kL) check (fused verify —
   repo invariant: no payload-carrying unverified pair ever shuffles).
   Degenerate hot variants (e.g. the empty string from keys with
   len ≤ k) would concentrate in one group; salt with
   ``stages/blocking.segmented_pair_indices`` if ever observed — name
   keys never get near it.
3. pairs found via multiple variants collapse through one
   ``groupby(id_a, id_b).aggregate(Min(dist))`` — combiner-first, and
   the distance is pair-deterministic so Min is a no-op semantically.

No counterpart in the reference engine (DerwenAI/textgraphs) — the
reference's fuzzy alias match (``textgraphs/graph.py`` OSA ≤ 1 pass)
is a point lookup; this is the set-at-scale join version.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Min

from ..functions.rounding import round_half_away
from ..functions.sketch import hash64


def deletion_variants(s: str, k: int) -> set[str]:
    """All strings at deletion-distance ≤ ``k`` from ``s`` (incl. s)."""
    frontier = {s}
    out = {s}
    for _ in range(k):
        nxt = {v[:i] + v[i + 1:] for v in frontier for i in range(len(v))}
        nxt -= out
        out |= nxt
        frontier = nxt
    return out


def lev_within(a: str, b: str, k: int) -> int | None:
    """Levenshtein distance if ≤ ``k`` else None.

    Early-exit fast paths for k-bounded checks (length gate, equal
    length ⇒ substitutions only at d ≤ 1, off-by-one length ⇒ single
    deletion), banded Ukkonen DP for the general case."""
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return None
    if a == b:
        return 0
    if la == lb:
        # equal length: ED ≤ mism (substitute each mismatch) and for
        # mism ≤ 2 exactly mism (a single ins/del changes length, so
        # ED 1 forces mism 1; ED < 2 is then impossible at mism 2).
        # At mism ≥ 3 an ins+del pair can beat substitutions
        # ("abc"→"bcx" is ED 2) — fall through to the DP.
        mism = sum(1 for x, y in zip(a, b) if x != y)
        if mism <= min(k, 2):
            return mism
        if k == 1:
            return None
    elif abs(la - lb) == 1:
        lo, hi = (a, b) if la < lb else (b, a)
        i = 0
        while i < len(lo) and lo[i] == hi[i]:
            i += 1
        if lo[i:] == hi[i + 1:]:
            return 1
        if k == 1:
            return None
    # banded DP, band half-width k
    if la > lb:
        a, b, la, lb = b, a, lb, la
    inf = k + 1
    prev = list(range(min(k, lb) + 1)) + [inf] * max(0, lb - k)
    prev = prev[:lb + 1]
    for i in range(1, la + 1):
        lo_j = max(1, i - k)
        hi_j = min(lb, i + k)
        cur = [inf] * (lb + 1)
        if lo_j == 1:
            cur[0] = i if i <= k else inf
        for j in range(lo_j, hi_j + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j - 1] + cost,
                         min(prev[j], cur[j - 1]) + 1)
        prev = cur
    return prev[lb] if prev[lb] <= k else None


def edit_distance_join(ds: "ray.data.Dataset", *, key_col: str,
                       id_col: str, k: int = 1,
                       metric: str = "levenshtein"
                       ) -> "ray.data.Dataset":
    """→ (id_a, id_b, dist): every distinct-row pair with
    ``dist(key_a, key_b) ≤ k`` and ``id_a < id_b`` — exact.

    ``metric="levenshtein"`` (any ``k``) matches DuckDB's
    ``levenshtein``; ``metric="osa"`` (``k = 1`` only) counts an
    adjacent transposition as ONE edit — at distance ≤ 1 OSA,
    unrestricted Damerau–Levenshtein, and DuckDB's
    ``damerau_levenshtein`` all coincide, so the oracle is exact.
    The deletion-variant cover extends to the transposition case:
    for ``s = x·ab·y`` and ``t = x·ba·y``, deleting the ``a`` from
    each side yields the same string ``x·b·y``, so every OSA ≤ 1 pair
    still shares a variant (the FastSS guarantee only promises this
    for Levenshtein, hence the ``k = 1`` restriction).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if metric not in ("levenshtein", "osa"):
        raise ValueError(f"metric must be 'levenshtein' or 'osa', "
                         f"got {metric!r}")
    if metric == "osa" and k != 1:
        raise ValueError("metric='osa' is only exact at k=1 (the "
                         "deletion-variant cover is proven for "
                         "single-edit transpositions)")
    empty = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                       ("dist", pa.int64())]).empty_table()
    if ds.schema() is None:
        return ray.data.from_arrow(empty)

    def emit_variants(t: pa.Table) -> pa.Table:
        ids, keys, variants = [], [], []
        for rid, s in zip(t.column(id_col).to_pylist(),
                          t.column(key_col).to_pylist()):
            for v in deletion_variants(s or "", k):
                ids.append(rid)
                keys.append(s or "")
                variants.append(v)
        return pa.table({
            # int64 BIT-VIEW of the uint64 hash (repo invariant: raw
            # uint64 overflows Arrow int64 during aggregate re-batching)
            "vh": pa.array(hash64(variants).view(np.int64)),
            "_id": pa.array(ids, pa.int64()),
            "key": pa.array(keys, pa.string()),
        })

    def verify_group(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["_id"].to_numpy()
        keys = g["key"].tolist()
        # a string's own variants are distinct, but hash collisions
        # could duplicate (id, key) rows within one group — drop them
        _, uniq = np.unique(ids, return_index=True)
        out_a, out_b, out_d = [], [], []
        if metric == "osa":
            from ..functions.strsim import osa_within

            def dist_fn(x: str, y: str):
                if x == y:
                    return 0
                return 1 if osa_within(x, y, 1) else None
        else:
            def dist_fn(x: str, y: str):
                return lev_within(x, y, k)

        # dist-0 (identical-key) pairs ARE emitted — exact duplicates
        # are the highest-value ER matches, and identical keys share
        # every deletion variant so their recall is structural (the
        # SQL oracles' `levenshtein(...) <= k` predicate includes them)
        for ii in range(len(uniq)):
            i = uniq[ii]
            for jj in range(ii + 1, len(uniq)):
                j = uniq[jj]
                d = dist_fn(keys[i], keys[j])
                if d is not None:
                    a, b = sorted((int(ids[i]), int(ids[j])))
                    out_a.append(a)
                    out_b.append(b)
                    out_d.append(d)
        # Arrow out: the pair stream feeds the dedup aggregate, and
        # Ray aggregates on pandas blocks run ~20× slower
        return pa.table({"id_a": pa.array(out_a, pa.int64()),
                         "id_b": pa.array(out_b, pa.int64()),
                         "dist": pa.array(out_d, pa.int64())})

    pairs = (ds.map_batches(emit_variants, batch_format="pyarrow")
             .groupby("vh").map_groups(verify_group,
                                       batch_format="pandas"))
    deduped = (pairs.groupby(["id_a", "id_b"])
               .aggregate(Min("dist", alias_name="dist")))
    if deduped.schema() is None or not deduped.schema().names:
        return ray.data.from_arrow(empty)
    return deduped


def jw_distinct_join(ds: "ray.data.Dataset", *, col: str,
                     threshold: float = 0.88,
                     max_distinct: int = 100_000) -> "ray.data.Dataset":
    """→ (name_a, name_b, jw): all DISTINCT-value pairs of ``col``
    (name_a < name_b) whose Jaro–Winkler similarity rounds to at least
    ``threshold`` at 6dp — the exact fuzzy self-join over a bounded
    name domain (dictionary/vocabulary dedup; the strsim analogue of
    ``phonetic_blocks``' distinct-word contract).

    Distinct values census first (one groupby), then the bounded name
    list broadcasts once (``ray.put``) and every streamed distinct
    name scores against all lexicographically-GREATER names in one
    ``jaro_winkler_batch`` call — each pair computed exactly once,
    work spread across the distinct stream's blocks, no driver loop.
    Above ``max_distinct``, block first (this is the verifier, not the
    blocker).

    Oracle parity note: this engine's JW applies the Winkler prefix
    boost unconditionally; DuckDB's ``jaro_winkler_similarity`` only
    boosts above Jaro 0.7.  For any pair either side reports at
    ``threshold ≥ 0.83`` the Jaro core necessarily exceeds 0.7
    (``jw ≤ 0.6·jaro + 0.4``), so both sides boost and the values —
    and the emitted pair SET — coincide exactly.  Keep thresholds
    ≥ 0.83 when comparing against the SQL oracle."""
    from ray.data.aggregate import Count

    from ..functions.strsim import jaro_winkler_batch

    from ..functions.bounded import collect_bounded

    distinct = (ds.groupby(col).aggregate(Count(alias_name="_n"))
                .select_columns([col]).materialize())
    names = np.array(sorted(r[col] for r in collect_bounded(
        distinct, max_distinct,
        "block before joining (the bounded-domain theta-join "
        "collects the distinct-name list) or raise max_distinct")),
        dtype=object)
    ref = ray.put(names)

    def pairs(t: pa.Table) -> pa.Table:
        arr = ray.get(ref)
        out_a: list[str] = []
        out_b: list[str] = []
        out_s: list[float] = []
        for nm in t.column(col).to_pylist():
            cand = arr[np.searchsorted(arr, nm, side="right"):]
            if not len(cand):
                continue
            # JW is an integer-ratio chain -> half-away 6dp
            s6 = round_half_away(jaro_winkler_batch(
                np.full(len(cand), nm, dtype=object), cand), 6)
            keep = s6 >= threshold
            k = int(keep.sum())
            if k:
                out_a.extend([nm] * k)
                out_b.extend(cand[keep].tolist())
                out_s.extend(s6[keep].tolist())
        return pa.table({"name_a": pa.array(out_a, pa.string()),
                         "name_b": pa.array(out_b, pa.string()),
                         "jw": pa.array(out_s, pa.float64())})

    return distinct.map_batches(pairs, batch_format="pyarrow")


def monge_elkan_join(ds: "ray.data.Dataset", *, col: str,
                     threshold: float = 0.85,
                     max_distinct: int = 100_000) -> "ray.data.Dataset":
    """→ (name_a, name_b, me): symmetrized Monge–Elkan similarity
    (Monge & Elkan 1996) over the distinct-value domain of ``col`` —
    ``ME(a→b)`` is the mean over a's tokens of each token's BEST
    Jaro–Winkler match among b's tokens; the join emits pairs with
    ``round((ME(a→b) + ME(b→a))/2, 6) ≥ threshold``, name_a < name_b.
    The hybrid matcher for multi-token names where word order and
    per-word typos both vary ("widget red" ≈ "red widgit").

    Same bounded-domain plan as :func:`jw_distinct_join` (distinct
    census → broadcast → each name scores all greater names), with
    token-level vectorization: one ``jaro_winkler_batch`` call per
    a-token against the flattened candidate token stream, then
    segment max/mean via ``reduceat``.  Token-level JW uses Winkler's
    ORIGINAL boost-above-0.7 rule (``boost_threshold=0.7``) so every
    value — including sub-0.7 ones that enter the means — matches
    DuckDB's ``jaro_winkler_similarity`` exactly."""
    from ray.data.aggregate import Count

    from ..functions.strsim import jaro_winkler_batch

    from ..functions.bounded import collect_bounded

    distinct = (ds.groupby(col).aggregate(Count(alias_name="_n"))
                .select_columns([col]).materialize())
    names = np.array(sorted(r[col] for r in collect_bounded(
        distinct, max_distinct,
        "block before joining (the bounded-domain theta-join "
        "collects the distinct-name list) or raise max_distinct")),
        dtype=object)
    ref = ray.put(names)

    def pairs(t: pa.Table) -> pa.Table:
        arr = ray.get(ref)
        toks = [nm.split(" ") for nm in arr]
        out_a: list[str] = []
        out_b: list[str] = []
        out_s: list[float] = []
        for nm in t.column(col).to_pylist():
            lo = int(np.searchsorted(arr, nm, side="right"))
            if lo >= len(arr):
                continue
            cand_toks = toks[lo:]
            lens = np.array([len(c) for c in cand_toks], np.int64)
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            flat_b = np.array([w for c in cand_toks for w in c],
                              dtype=object)
            ta = nm.split(" ")
            # (|ta|, |flat_b|) token-level JW, one batch call per row
            sims = np.stack([jaro_winkler_batch(
                np.full(len(flat_b), w, dtype=object), flat_b,
                boost_threshold=0.7) for w in ta])
            # ME(a→b): per-candidate max over b-tokens, mean over ta
            per_cand_max = np.stack([np.maximum.reduceat(row, starts)
                                     for row in sims])
            me_ab = per_cand_max.mean(axis=0)
            # ME(b→a): per b-token max over a-tokens, mean per cand
            best_for_b = sims.max(axis=0)
            me_ba = np.add.reduceat(best_for_b, starts) / lens
            # rational mean-of-ratios -> half-away 6dp
            me = round_half_away((me_ab + me_ba) / 2.0, 6)
            keep = me >= threshold
            k = int(keep.sum())
            if k:
                out_a.extend([nm] * k)
                out_b.extend(arr[lo:][keep].tolist())
                out_s.extend(me[keep].tolist())
        return pa.table({"name_a": pa.array(out_a, pa.string()),
                         "name_b": pa.array(out_b, pa.string()),
                         "me": pa.array(out_s, pa.float64())})

    return distinct.map_batches(pairs, batch_format="pyarrow")
