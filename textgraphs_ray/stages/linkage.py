"""Fellegi–Sunter probabilistic record linkage (1969) with EM.

The classic decision-theoretic scorer for entity resolution: each
candidate pair gets a vector of field-agreement indicators γ (exact
last-token match, phonetic match, high Jaro–Winkler, …), and the
match weight is  Σ_i log2(m_i/u_i)  over agreeing fields plus
log2((1−m_i)/(1−u_i)) over disagreeing ones, where m_i = P(agree_i |
match) and u_i = P(agree_i | non-match).  Winkler's EM estimates
(p, m, u) without labeled data under conditional independence.

**The 100-TB design hinge**: EM never touches pairs.  Agreement
vectors collapse to their PATTERN (≤ 2^k distinct bit-vectors for k
fields), per-batch combiners count patterns, one tiny groupby yields
the pattern histogram, and EM iterates on that constant-size table on
the driver.  Scoring is then a broadcast (pattern → weight/posterior)
lookup in a stateless scan — the pair stream is touched exactly
twice, shuffled never.

Reference anchor: the engine's deterministic threshold scorer
(`stages/scoring.py`) reproduces the reference's exact-equality
semantics; Fellegi–Sunter is the probabilistic upgrade a record-
linkage user expects on noisy corpora (cf. `SURVEY.md` J8).
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Sum

from ..functions.strsim import jaro_winkler_batch, soundex


def default_fields() -> list[tuple[str, Callable]]:
    """Standard name-matching comparison vector: (name, fn) where fn
    maps (text_a: list[str], text_b: list[str]) → bool ndarray."""
    def last_tok(ts):
        return [t.rsplit(" ", 1)[-1] for t in ts]

    def f_exact(a, b):
        return np.array([x == y for x, y in zip(a, b)])

    def f_last(a, b):
        return np.array([x == y for x, y in
                         zip(last_tok(a), last_tok(b))])

    def f_phonetic(a, b):
        return np.array([soundex(x) == soundex(y) for x, y in
                         zip(last_tok(a), last_tok(b))])

    def f_jw(a, b):
        return jaro_winkler_batch(a, b) >= 0.90

    return [("exact", f_exact), ("last_token", f_last),
            ("phonetic", f_phonetic), ("jw90", f_jw)]


def _patterns_of(t: pa.Table, fields, a_col: str,
                 b_col: str) -> np.ndarray:
    a = [x or "" for x in t.column(a_col).to_pylist()]
    b = [x or "" for x in t.column(b_col).to_pylist()]
    pat = np.zeros(len(a), dtype=np.int64)
    for bit, (_, fn) in enumerate(fields):
        pat |= fn(a, b).astype(np.int64) << bit
    return pat


def fs_em(pattern_counts: dict[int, int], k: int, *,
          iters: int = 40, p0: float = 0.1,
          m0: float = 0.9, u0: float = 0.1) -> dict:
    """EM over the pattern histogram → (p, m[k], u[k], posteriors).

    Deterministic given the histogram (fixed init, fixed iteration
    count) — the whole fit is O(iters · 2^k), independent of corpus
    size.
    """
    pats = np.array(sorted(pattern_counts), dtype=np.int64)
    cnt = np.array([pattern_counts[p] for p in pats], dtype=np.float64)
    bits = ((pats[:, None] >> np.arange(k)[None, :]) & 1).astype(
        np.float64)                                   # (P, k)
    p, m, u = p0, np.full(k, m0), np.full(k, u0)
    for _ in range(iters):
        lm = (np.log(np.clip(m, 1e-9, 1 - 1e-9))[None, :] * bits
              + np.log(np.clip(1 - m, 1e-9, 1))[None, :] * (1 - bits)
              ).sum(axis=1)
        lu = (np.log(np.clip(u, 1e-9, 1 - 1e-9))[None, :] * bits
              + np.log(np.clip(1 - u, 1e-9, 1))[None, :] * (1 - bits)
              ).sum(axis=1)
        num = p * np.exp(lm)
        g = num / np.clip(num + (1 - p) * np.exp(lu), 1e-300, None)
        wm = (g * cnt).sum()
        wu = ((1 - g) * cnt).sum()
        p = wm / (wm + wu)
        m = (bits * (g * cnt)[:, None]).sum(axis=0) / np.clip(wm, 1e-300,
                                                              None)
        u = (bits * ((1 - g) * cnt)[:, None]).sum(axis=0) / np.clip(
            wu, 1e-300, None)
    weight = (np.log2(np.clip(m, 1e-9, None)
                      / np.clip(u, 1e-9, None))[None, :] * bits
              + np.log2(np.clip(1 - m, 1e-9, None)
                        / np.clip(1 - u, 1e-9, None))[None, :]
              * (1 - bits)).sum(axis=1)
    return {"p": float(p), "m": m, "u": u,
            "patterns": pats, "posterior": g, "weight": weight}


def fellegi_sunter(pairs_ds: "ray.data.Dataset", *,
                   a_col: str = "text_a", b_col: str = "text_b",
                   fields: Sequence | None = None, iters: int = 40,
                   tau: float = 0.5) -> dict:
    """Candidate pairs → FS-scored pairs + the fitted model.

    Returns ``{"model": dict, "patterns": DataFrame, "scored":
    Dataset}``: the EM fit, the per-pattern summary table (pattern
    bits, pair count, match weight, posterior, decision at ``tau``),
    and the pair stream with (weight, posterior, is_match) attached
    via a broadcast pattern lookup — no shuffle anywhere.
    """
    fields = list(fields or default_fields())
    k = len(fields)

    def partial(t: pa.Table) -> pa.Table:
        pat = _patterns_of(t, fields, a_col, b_col)
        v, c = np.unique(pat, return_counts=True)
        return pa.table({"pattern": pa.array(v),
                         "n": pa.array(c.astype(np.int64))})

    hist_rows = (pairs_ds.map_batches(partial, batch_format="pyarrow")
                 .groupby("pattern").aggregate(Sum("n", alias_name="n"))
                 .take_all())
    hist = {r["pattern"]: r["n"] for r in hist_rows}
    if not hist:
        empty = pd.DataFrame({"pattern": pd.Series([], dtype="int64"),
                              "n_pairs": pd.Series([], dtype="int64"),
                              "weight": pd.Series([], dtype="float64"),
                              "posterior": pd.Series([], dtype="float64"),
                              "is_match": pd.Series([], dtype="bool")})
        return {"model": None, "patterns": empty, "scored": pairs_ds}
    model = fs_em(hist, k, iters=iters)
    summary = pd.DataFrame({
        "pattern": model["patterns"],
        "n_pairs": [hist[p] for p in model["patterns"]],
        "weight": np.round(model["weight"], 6),
        "posterior": np.round(model["posterior"], 6),
        "is_match": model["posterior"] >= tau})
    lut = {int(p): (float(w), float(g), bool(g >= tau))
           for p, w, g in zip(model["patterns"], model["weight"],
                              model["posterior"])}
    ref = ray.put((fields, lut))

    def score(t: pa.Table) -> pa.Table:
        flds, m = ray.get(ref)
        pat = _patterns_of(t, flds, a_col, b_col)
        w = np.array([m[int(x)][0] for x in pat])
        g = np.array([m[int(x)][1] for x in pat])
        d = np.array([m[int(x)][2] for x in pat])
        return (t.append_column("weight",
                                pa.array(np.round(w, 6)))
                .append_column("posterior", pa.array(np.round(g, 6)))
                .append_column("is_match", pa.array(d)))

    scored = pairs_ds.map_batches(score, batch_format="pyarrow")
    return {"model": model, "patterns": summary, "scored": scored}
