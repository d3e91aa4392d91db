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
    from ..functions.strsim import jaro_winkler, osa_within

    ta, tb = a.split(), b.split()
    if len(ta) < 2 or len(tb) < 2:
        return False
    if ta[0][:1] != tb[0][:1]:
        return False
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
        a = batch.column("text_a").to_pylist()
        b = batch.column("text_b").to_pylist()
        ka = batch.column("key_a").to_pylist()
        kb = batch.column("key_b").to_pylist()
        n = len(a)
        if n == 0:
            return pa.table({"key_a": pa.array([], pa.string()),
                             "key_b": pa.array([], pa.string()),
                             "score": pa.array([], pa.float64()),
                             "method": pa.array([], pa.string())})

        exact = np.array([x == y and x != "" for x, y in zip(a, b)])
        jw = jaro_winkler_batch(a, b)
        lev = levenshtein_sim_batch(a, b)
        compat = np.array([name_compat(x, y) for x, y in zip(a, b)])

        # Whole-string similarity is only trusted for single-token
        # surfaces: between multi-token names a shared first token
        # inflates JW past 0.9 for different people ("walter galindo"
        # vs "walter ivanov" → 0.92), and differing initials alone keep
        # JW high ("j moreau" vs "q moreau" → 0.92).  Multi-token pairs
        # route exclusively through the token-aware alias rule.
        def _both_multi(x: str, y: str) -> bool:
            return len(x.split()) >= 2 and len(y.split()) >= 2

        multi = np.array([_both_multi(x, y) for x, y in zip(a, b)])
        conflict = np.array(
            [_both_multi(x, y) and x.split()[0][:1] != y.split()[0][:1]
             for x, y in zip(a, b)])
        jw = np.where(multi, 0.0, jw)
        lev = np.where(multi, 0.0, lev)

        media = np.array([x.startswith("media:") or y.startswith("media:")
                          for x, y in zip(ka, kb)])
        cos = np.zeros(n)
        if media.any():
            idx = np.nonzero(media)[0]
            ea = self.encode([a[i] for i in idx], dim=self.dim)
            eb = self.encode([b[i] for i in idx], dim=self.dim)
            cos[idx] = cosine_batch(ea, eb)
        cos = np.where(conflict, 0.0, cos)

        score = np.maximum.reduce([
            np.where(exact, 1.0, 0.0),
            jw * (jw >= self.min_sim),
            lev * (lev >= self.lev_accept),
            np.where(compat, 0.95, 0.0),
            np.where(media, cos * (cos >= self.min_sim), 0.0),
        ])
        method = np.select(
            [exact, compat, jw >= self.min_sim, lev >= self.lev_accept,
             media & (cos >= self.min_sim)],
            ["exact", "alias", "jaro_winkler", "levenshtein", "cosine"],
            default="",
        )
        keep = score >= min(self.min_sim, self.lev_accept)
        keep &= np.array(method, dtype=object) != ""
        return pa.table({
            "key_a": pa.array([ka[i] for i in np.nonzero(keep)[0]], pa.string()),
            "key_b": pa.array([kb[i] for i in np.nonzero(keep)[0]], pa.string()),
            "score": pa.array(score[keep], pa.float64()),
            "method": pa.array([str(m) for m in method[keep]], pa.string()),
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
