"""Pairwise candidate scoring (SURVEY.md J8/M13; north_rule stage 3).

Replaces the reference's per-pair ``difflib.SequenceMatcher`` alias
scoring (``/root/reference/textgraphs/kg.py:501-550``, exact-match
early exit kg.py:536-541) with batched kernels over the candidate-pair
stream:

- normalized-exact early exit (score 1.0);
- batched Jaro-Winkler + vectorized Levenshtein similarity on span
  text;
- a deterministic name-compatibility rule (equal last token + equal
  first initial ⇒ strong match) standing in for the reference's alias
  list matching (``KGSearchHit.aliases``, kg.py:516-535);
- embedding cosine via the encoder actor pool for pairs involving
  media-derived text (north_rule: "embedding cosine on media_ref/text
  spans via stateful actor pools holding the encoder").

Accept threshold follows the reference's ``min_similarity = 0.9``
(``defaults.py:14``).  Output is the match-edge stream feeding
transitive closure.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..functions.sketch import shingle_embedding_batch
from ..functions.strsim import (cosine_batch, jaro_winkler_batch,
                                levenshtein_sim_batch)

MIN_SIMILARITY = 0.9  # reference defaults.py:14
LEV_ACCEPT = 0.84


def name_compat(a: str, b: str) -> bool:
    """Token-aware alias rule for multi-token names: first-token
    initials equal AND last tokens either equal or one-edit-close
    (JW ≥ 0.94).  Stand-in for the reference's alias-list matching
    (kg.py:516-535) with the same intent: high-precision merges that
    pure whole-string similarity misses (initials, token-local typos).
    """
    ta, tb = a.split(), b.split()
    if len(ta) < 2 or len(tb) < 2:
        return False
    if ta[0][:1] != tb[0][:1]:
        return False
    return _name_compat_tokens(ta, tb)


def _name_compat_tokens(ta: list, tb: list) -> bool:
    """Core of :func:`name_compat` on pre-split tokens; callers have
    already established both are multi-token with equal initials."""
    from ..functions.strsim import jaro_winkler, osa_within

    la, lb = ta[-1], tb[-1]
    if la == lb:
        return True
    # one OSA edit (deletion / insertion / substitution / adjacent
    # transposition) in the last token is a typo, not a different
    # name: JW under-scores edits near the string head (no prefix
    # bonus), while OSA is position-blind and counts a transposition
    # as a single edit.  Precision-safe whenever distinct same-initial
    # entities' last names differ by ≥ 3 edits (true of the curated
    # pool, checked pairwise).
    if len(la) >= 5 and len(lb) >= 5 and osa_within(la, lb, 1):
        return True
    # full-first-token agreement licenses a laxer last-token bound
    thresh = 0.90 if ta[0] == tb[0] and len(ta[0]) > 2 else 0.94
    return jaro_winkler(la, lb) >= thresh


class PairScorer:
    """Actor-pool stage: candidate pairs → scored match edges.

    The encoder ("model") lives in ``__init__`` — loaded once per
    actor.  All kernels run batched; the JW memo caches distinct pairs
    within a batch.
    """

    def __init__(self, *, min_sim: float = MIN_SIMILARITY,
                 lev_accept: float = LEV_ACCEPT, dim: int = 64) -> None:
        self.min_sim = min_sim
        self.lev_accept = lev_accept
        self.dim = dim
        self.encode = shingle_embedding_batch

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd
        import pyarrow.compute as pc

        n = batch.num_rows
        if n == 0:
            return pa.table({"key_a": pa.array([], pa.string()),
                             "key_b": pa.array([], pa.string()),
                             "score": pa.array([], pa.float64()),
                             "method": pa.array([], pa.string())})

        a = batch.column("text_a").to_pylist()
        b = batch.column("text_b").to_pylist()
        media_occ = pc.or_(
            pc.starts_with(batch.column("key_a"), "media:"),
            pc.starts_with(batch.column("key_b"), "media:"),
        ).to_numpy(zero_copy_only=False)

        # A pair colliding in several LSH bands reaches the scorer once
        # per band (candidate_pairs skips the pair-dedup shuffle on
        # purpose) — measured ~2.4× duplication.  Score each distinct
        # (text_a, text_b, media?) ONCE and scatter the result back.
        comb = [x + "\x1f" + y + ("\x1fm" if m else "")
                for x, y, m in zip(a, b, media_occ)]
        codes, _ = pd.factorize(np.asarray(comb, dtype=object), sort=False)
        _, first_idx = np.unique(codes, return_index=True)
        k = len(first_idx)
        ad = [a[i] for i in first_idx]
        bd = [b[i] for i in first_idx]
        media = media_occ[first_idx]

        exact = np.fromiter((x == y and x != "" for x, y in zip(ad, bd)),
                            bool, count=k)
        toks_a = [x.split() for x in ad]
        toks_b = [y.split() for y in bd]
        nt_a = np.fromiter(map(len, toks_a), np.int64, count=k)
        nt_b = np.fromiter(map(len, toks_b), np.int64, count=k)
        # Whole-string similarity is only trusted for single-token
        # surfaces: between multi-token names a shared first token
        # inflates JW past 0.9 for different people ("walter galindo"
        # vs "walter ivanov" → 0.92), and differing initials alone keep
        # JW high ("j moreau" vs "q moreau" → 0.92).  Multi-token pairs
        # route exclusively through the token-aware alias rule, so the
        # JW/Levenshtein kernels run ONLY on the single-token subset.
        multi = (nt_a >= 2) & (nt_b >= 2)
        init_eq = np.fromiter(
            (ta[0][:1] == tb[0][:1] if ta and tb else True
             for ta, tb in zip(toks_a, toks_b)), bool, count=k)
        conflict = multi & ~init_eq

        jw = np.zeros(k)
        lev = np.zeros(k)
        single = np.nonzero(~multi)[0]
        if len(single):
            sa = [ad[i] for i in single]
            sb = [bd[i] for i in single]
            jw[single] = jaro_winkler_batch(sa, sb)
            lev[single] = levenshtein_sim_batch(sa, sb)

        # alias rule: only multi-token pairs with equal initials can
        # pass, and exact pairs resolve to method "exact" regardless
        compat = np.zeros(k, dtype=bool)
        for i in np.nonzero(multi & init_eq & ~exact)[0]:
            compat[i] = _name_compat_tokens(toks_a[i], toks_b[i])

        cos = np.zeros(k)
        midx = np.nonzero(media)[0]
        if len(midx):
            # encode each distinct TEXT once (pairs share surfaces)
            texts_m = [ad[i] for i in midx] + [bd[i] for i in midx]
            tcodes, uniq_t = pd.factorize(
                np.asarray(texts_m, dtype=object), sort=False)
            emb = self.encode(list(uniq_t), dim=self.dim)[tcodes]
            cos[midx] = cosine_batch(emb[: len(midx)], emb[len(midx):])
        cos = np.where(conflict, 0.0, cos)

        score_d = np.maximum.reduce([
            np.where(exact, 1.0, 0.0),
            jw * (jw >= self.min_sim),
            lev * (lev >= self.lev_accept),
            np.where(compat, 0.95, 0.0),
            np.where(media, cos * (cos >= self.min_sim), 0.0),
        ])
        method_d = np.select(
            [exact, compat, jw >= self.min_sim, lev >= self.lev_accept,
             media & (cos >= self.min_sim)],
            ["exact", "alias", "jaro_winkler", "levenshtein", "cosine"],
            default="",
        )
        score = score_d[codes]
        method = method_d[codes]
        keep = score >= min(self.min_sim, self.lev_accept)
        keep &= method != ""
        keep_arr = pa.array(keep)
        return pa.table({
            "key_a": batch.column("key_a").filter(keep_arr),
            "key_b": batch.column("key_b").filter(keep_arr),
            "score": pa.array(score[keep], pa.float64()),
            "method": pa.array(method[keep].tolist(), pa.string()),
        })


def score_pairs(pairs_ds: "ray.data.Dataset", *,
                concurrency=None, batch_size: int = 8192) -> "ray.data.Dataset":
    # PairScorer state is a few scalars + a function ref — no model
    # load — so it runs as tasks (instance passed as a plain callable):
    # no pool ramp-up, immediate full-cluster spread.  A real encoder
    # model would flip this back to a class + concurrency pool (T4).
    del concurrency
    return pairs_ds.map_batches(PairScorer(), batch_format="pyarrow",
                                batch_size=batch_size)


def dedup_matches(matches_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Distinct match edges (a pair scored in several bands appears
    several times; dedup AFTER scoring because the accepted-edge stream
    is orders of magnitude smaller than the candidate stream)."""
    from ray.data.aggregate import Max, Min

    return matches_ds.groupby(["key_a", "key_b"]).aggregate(
        Max("score", alias_name="score"),
        Min("method", alias_name="method"))
