"""Distributed PCA over an embedding column (``list<float>``).

Embedding pipelines whiten / reduce vectors before indexing or dedup
(SemDeDup preprocesses exactly this way); at 10^9+ vectors that means
computing a (D, D) covariance WITHOUT materializing the matrix of all
vectors.  The sufficient statistics are classic mergeable partials —
one streaming ``map_batches`` pass emits per-block
``(n, Σx, ΣxxT)`` rows (D + D² + 1 floats per BLOCK, independent of
row count), the driver folds the ≤ #blocks tiny rows, and the (D, D)
eigendecomposition is a driver-side ``np.linalg.eigh`` (D ≤ a few
thousand — microseconds, never distributed).  Projection is then a
stateless broadcast matmul per batch.

Everything is float64 and deterministic: the covariance agrees with
DuckDB's ``covar_samp`` to the 6dp the oracle compares
(``embedding_cov``), and component signs are canonicalized (largest-
magnitude coordinate positive) so projections are reproducible across
runs and cluster layouts.  The reference engine has no counterpart
(single-process, no embedding columns); this belongs to the
similarity/dedup operator family (SURVEY.md §2 training-data
extensions).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..functions.vec import embeddings_to_ndarray


def embedding_moments(ds: "ray.data.Dataset", *,
                      emb_col: str = "embedding"
                      ) -> tuple[int, np.ndarray, np.ndarray]:
    """→ ``(n, mean (D,), cov (D, D))`` — sample covariance, one pass.

    Per-block partials: ``n``, ``Σx`` and the flattened raw second
    moment ``Σ x xᵀ`` (one row per block); the driver folds blocks and
    forms ``cov = (S2 - n·mean·meanᵀ) / (n - 1)``.
    """

    def partial(batch: pa.Table) -> pa.Table:
        emb = embeddings_to_ndarray(batch.column(emb_col), dtype=np.float64)
        if emb.size == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "s1": pa.array([], pa.list_(pa.float64())),
                             "s2": pa.array([], pa.list_(pa.float64()))})
        return pa.table({
            "n": pa.array([emb.shape[0]], pa.int64()),
            "s1": pa.array([emb.sum(axis=0)]),
            "s2": pa.array([(emb.T @ emb).ravel()]),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty or int(parts["n"].sum()) == 0:
        return 0, np.zeros(0), np.zeros((0, 0))
    n = int(parts["n"].sum())
    s1 = np.sum(np.stack(parts["s1"].to_numpy()), axis=0)
    s2 = np.sum(np.stack(parts["s2"].to_numpy()), axis=0)
    d = s1.shape[0]
    mean = s1 / n
    cov = (s2.reshape(d, d) - n * np.outer(mean, mean)) / max(1, n - 1)
    return n, mean, cov


def pca_train(ds: "ray.data.Dataset", k: int, *,
              emb_col: str = "embedding") -> dict:
    """→ ``{mean, components (k, D), explained_variance (k,)}`` —
    top-k principal components by eigendecomposition of the streamed
    covariance.  Signs canonicalized: each component's largest-
    magnitude coordinate is positive (eigenvectors are sign-ambiguous;
    pinning it makes projections run-reproducible)."""
    n, mean, cov = embedding_moments(ds, emb_col=emb_col)
    if n == 0:
        return {"mean": mean, "components": np.zeros((0, 0)),
                "explained_variance": np.zeros(0)}
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comp = vecs[:, order].T  # (k, D)
    flip = np.sign(comp[np.arange(comp.shape[0]),
                        np.abs(comp).argmax(axis=1)])
    comp = comp * flip[:, None]
    return {"mean": mean, "components": comp,
            "explained_variance": vals[order]}


def pca_project(ds: "ray.data.Dataset", model: dict, *,
                emb_col: str = "embedding",
                out_col: str = "pca") -> "ray.data.Dataset":
    """Append ``out_col`` = ``(x - mean) @ componentsᵀ`` (list<float>,
    k dims).  The (k, D) model broadcasts once via ``ray.put``; each
    batch is one centered matmul."""
    m_ref = ray.put({"mean": np.ascontiguousarray(model["mean"]),
                     "components": np.ascontiguousarray(
                         model["components"])})

    def project(batch: pa.Table) -> pa.Table:
        m = ray.get(m_ref)
        emb = embeddings_to_ndarray(batch.column(emb_col), dtype=np.float64)
        if emb.size == 0:
            return batch.append_column(
                out_col, pa.array([], pa.list_(pa.float64())))
        proj = (emb - m["mean"]) @ m["components"].T
        return batch.append_column(out_col, pa.array(list(proj)))

    return ds.map_batches(project, batch_format="pyarrow")
