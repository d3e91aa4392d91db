"""Deterministic weighted (importance) sampling for corpus curation.

Domain/quality reweighting (DSIR/DoReMi-style mixture shaping) needs a
sampler that (a) keeps a row with a per-row probability, (b) is
reproducible across reruns, block layouts and cluster sizes, and (c)
never coordinates between workers.  The standard trick: derive a
uniform [0,1) variate from a content hash of the row's key and keep the
row iff ``u < p_keep``.  No RNG state, no shuffle, one stateless
``map_batches`` — every worker makes the same decision for the same
row, so resumed or re-sharded runs select identical samples.

``md5`` (first 8 hex chars → /2^32) is used as the variate so the
sample is *SQL-reproducible* — the DuckDB oracle replays the exact
selection (same convention as ``det_sample`` / ``functions/bottomk``).
At production scale swap :func:`md5_frac` for the keyed siphash in
``functions/sketch.hash64`` when oracle parity is not needed; the
selection logic is unchanged.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data


def md5_frac(keys: list) -> np.ndarray:
    """Per-key uniform [0,1) variate: first 8 md5 hex chars / 2^32.

    Matches SQL ``('0x' || substr(md5(k::VARCHAR), 1, 8))::UBIGINT /
    4294967296.0`` exactly (both sides do the same double division)."""
    return np.fromiter(
        (int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) / 2**32
         for k in keys), np.float64, count=len(keys))


def importance_sample(ds: "ray.data.Dataset", *, prob_col: str,
                      id_col: str = "doc_id") -> "ray.data.Dataset":
    """Keep each row iff ``md5_frac(id) < row[prob_col]``.

    ``prob_col`` holds the per-row keep probability in [0,1], computed
    upstream by any vectorized expression (quality score, domain
    weight, length prior...).  Expected sample size is
    ``sum(prob_col)``; the realized sample is deterministic."""

    def keep(t: pa.Table) -> pa.Table:
        u = md5_frac(t.column(id_col).to_pylist())
        p = np.asarray(t.column(prob_col).to_numpy(zero_copy_only=False),
                       np.float64)
        return t.filter(pa.array(u < p))

    return ds.map_batches(keep, batch_format="pyarrow")


def hash_split(ds: "ray.data.Dataset", *, splits: dict[str, float],
               key_col: str = "doc_id",
               out_col: str = "split") -> "ray.data.Dataset":
    """Deterministic train/val/test split: append ``out_col`` with the
    split name chosen by each row's md5 variate against the cumulative
    split fractions (``splits`` values must sum to ≤ 1; any remainder
    falls into the LAST split).

    Stateless ``map_batches`` — no shuffle, no RNG, identical
    assignment for any block layout / cluster size / rerun, and
    SQL-replayable (``CASE WHEN frac < c1 THEN ... END`` over the same
    md5 arithmetic as :func:`md5_frac`).

    For a LEAKAGE-SAFE split (near/exact duplicates must not straddle
    train and test), hash a GROUP key instead of the row key: pass the
    dedup cluster id (or exact-dup keeper id) as ``key_col`` so every
    member of a cluster inherits one split — see the ``split_assign``
    query for the composed pattern.

    CHAINED-SELECTION CAVEAT: every md5-variate stage in this module
    (``importance_sample``, ``mixture_sample``, ``hash_split``, the
    ``sample_hex_prefix`` gate) draws its variate from the SAME
    ``md5(key)`` — composing two of them on one raw key correlates
    the draws (e.g. a ``mixture_sample(target_frac=0.7)`` survivor
    set has every variate < 0.7, so a downstream 90/5/5 ``hash_split``
    on the same key puts everything in train).  Salt the key per
    stage (``doc_id || '#split'``) when chaining — see
    ``examples/training_data_pipeline.py``.
    """
    names = list(splits.keys())
    bounds = np.cumsum([splits[n] for n in names])
    if len(bounds) and bounds[-1] > 1.0 + 1e-9:
        raise ValueError(
            f"split fractions sum to {bounds[-1]:.4f} > 1: {splits}")

    def assign(t: pa.Table) -> pa.Table:
        u = md5_frac(t.column(key_col).to_pylist())
        idx = np.minimum(np.searchsorted(bounds, u, side="right"),
                         len(names) - 1)
        lab = np.asarray(names, dtype=object)[idx]
        return t.append_column(out_col, pa.array(lab, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def leakage_safe_split(nodes: "ray.data.Dataset",
                       edges: "ray.data.Dataset", *,
                       splits: dict[str, float],
                       num_partitions: int = 16,
                       driver_threshold: int = 2_000_000,
                       out_col: str = "split") -> "ray.data.Dataset":
    """→ (key, cluster_id, split): train/val/test assignment hashed on
    the TRANSITIVE duplicate-cluster id — the near-duplicate
    generalization of hashing the exact-dup keeper (``split_assign``).

    A naive per-row split leaks: two near-duplicate documents land on
    opposite sides of the train/test fence and the eval set scores
    memorization (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better" — public).  Exact-dup keeper hashing only
    closes the fence for byte-identical copies; near-dup pairs (from
    MinHash/SimHash/embedding blocking) form CHAINS, so the unit that
    must move atomically is the connected component.  Composition:
    :func:`textgraphs_ray.stages.cluster.propagate_labels` (the ER
    closure — min-label components over ``nodes(key)`` /
    ``edges(key_a, key_b)``) then :func:`hash_split` keyed on
    ``cluster_id``, so every member of a component inherits one md5
    variate.  Both stages are the flagship chain's own operators —
    distributed closure above ``driver_threshold`` edges, stateless
    SQL-replayable assignment — and the output is resumable/rerun
    invariant like every md5-variate sampler here."""
    from .cluster import propagate_labels

    labels = propagate_labels(nodes, edges,
                              num_partitions=num_partitions,
                              driver_threshold=driver_threshold)
    return hash_split(labels, splits=splits, key_col="cluster_id",
                      out_col=out_col)


def stratified_sample(ds: "ray.data.Dataset", *, group_col: str,
                      n: int, id_col: str = "doc_id",
                      columns: list | None = None) -> "ray.data.Dataset":
    """Deterministic n-per-group sample → the ``n`` rows of each group
    with the smallest ``md5(id)`` digest (uniform without replacement,
    identical for any block layout / cluster size / rerun).

    The balanced-mixture counterpart of :func:`importance_sample`
    (fixed COUNT per stratum vs fixed per-row probability): cap every
    source/domain/language at ``n`` documents for a training mixture.

    Physical plan: a per-batch combiner keeps each batch's n smallest
    digests per group — the shuffle then moves at most ``n`` rows per
    group per batch, never the full stratum — followed by one groupby
    whose reducer re-selects the global bottom-n (bottom-k merges are
    associative, same law as ``functions/bottomk``).  SQL replays the
    exact sample: ``row_number() OVER (PARTITION BY g ORDER BY
    md5(id), id) <= n``.
    """
    import pandas as pd

    keep_cols = columns or [group_col, id_col]

    def _prioritize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_pri"] = [hashlib.md5(str(k).encode()).hexdigest()
                      for k in df[id_col]]
        return df

    def partial(t: pa.Table) -> pd.DataFrame:
        df = _prioritize(t.select(keep_cols).to_pandas())
        return (df.sort_values([group_col, "_pri", id_col], kind="stable")
                .groupby(group_col, sort=False).head(n))

    def reduce_grp(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["_pri", id_col], kind="stable").head(n)
        return g[keep_cols].reset_index(drop=True)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(group_col)
            .map_groups(reduce_grp, batch_format="pandas"))


def mixture_sample(ds: "ray.data.Dataset", *, alpha: float = 0.5,
                   target_frac: float = 0.5,
                   source_col: str = "source",
                   id_col: str = "doc_id") -> "ray.data.Dataset":
    """Temperature-scaled mixture sampling: keep each row of source
    ``s`` with probability ``r_s = min(1, target_frac · N · n_s^(α−1)
    / Σ_t n_t^α)`` — the α-sampling mixture-rebalancing step of
    multilingual / multi-domain pretraining (XLM-R / mT5 style:
    expected kept mass per source ∝ n_s^α, total ≈ ``target_frac·N``).
    α = 1 is uniform ``target_frac`` sampling; α < 1 upweights small
    sources.  Rates that clamp at 1 shift the realized total below the
    target (the standard caveat; at α ≤ 1 only sources smaller than
    the mean clamp).

    One tiny groupby (|sources| rows) computes the counts; the keep
    decision is the same driver-free ``md5_frac(id) < r_s`` scan as
    :func:`importance_sample`, so the selection is byte-stable across
    reruns / block layouts / cluster sizes and SQL-replayable
    (``LEAST(1.0, …)`` + the md5 variate in the oracle)."""
    counts = {r[source_col]: r["count()"] for r in
              ds.select_columns([source_col])
              .groupby(source_col).count().take_all()}
    n_total = float(sum(counts.values()))
    if n_total == 0:
        return ds
    z = float(sum(n ** alpha for n in counts.values()))
    rates = {s: min(1.0, target_frac * n_total * n ** (alpha - 1.0) / z)
             for s, n in counts.items()}
    rates_ref = ray.put(rates)

    def keep(t: pa.Table) -> pa.Table:
        r = ray.get(rates_ref)
        u = md5_frac(t.column(id_col).to_pylist())
        thresh = np.array([r.get(s, 0.0) for s in
                           t.column(source_col).to_pylist()])
        return t.filter(pa.array(u < thresh))

    return ds.map_batches(keep, batch_format="pyarrow")


def weighted_sample(ds: "ray.data.Dataset", *, k: int,
                    weight_col: str, id_col: str = "doc_id"
                    ) -> "ray.data.Dataset":
    """Weighted random sampling without replacement (Efraimidis &
    Spirakis A-ES): each row gets key ``u^(1/w)`` — here its log form
    ``score = ln(u) / w`` — and the k largest keys ARE a weighted
    sample without replacement.  ``u = (md5_64(id)+1)/2^32 ∈ (0, 1]``
    is the engine's deterministic md5 variate, so the selection is
    byte-stable across reruns / block layouts / cluster sizes and
    SQL-replayable (quality- or length-weighted corpus subsampling
    with an exact oracle).

    Distribution: one stateless scan computes scores and truncates to
    the BLOCK-LOCAL top-k (``select_k_unstable``), then the global
    sort sees ≤ k rows per block — never an all-to-all of the corpus
    (same shape as the `o1_topk` combiner).  Rows with non-positive
    weight are excluded (u^(1/w) is undefined there).

    → the input columns of the k sampled rows + ``score`` (rounded
    6dp), score desc / id asc.
    """
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        w = t.column(weight_col).to_numpy(zero_copy_only=False)
        pos = w > 0
        t = t.filter(pa.array(pos))
        if t.num_rows == 0:
            return t.append_column("score", pa.array([], pa.float64()))
        u = md5_frac(t.column(id_col).to_pylist()) + 2.0 ** -32
        score = np.log(u) / w[pos]
        t = t.append_column("score", pa.array(score, pa.float64()))
        idx = pc.select_k_unstable(
            t, k=min(k, t.num_rows),
            sort_keys=[("score", "descending"), (id_col, "ascending")])
        return t.take(idx)

    top = (ds.map_batches(partial, batch_format="pyarrow")
           .sort(["score", id_col], descending=[True, False]).limit(k))
    return top.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("score"), "score",
            pc.round(t.column("score"), 6)),
        batch_format="pyarrow")
