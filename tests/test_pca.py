"""stages/pca.py: streamed moments == numpy exact stats, PCA equals
single-process numpy PCA, sign canonicalization, projection pipeline,
and edge cases."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from textgraphs_ray.stages.pca import (embedding_moments, pca_project,
                                       pca_train)


def _data(n: int = 600, d: int = 16, seed: int = 9) -> np.ndarray:
    rng = np.random.default_rng(seed)
    # anisotropic: a few dominant directions so PCA order is stable
    scales = np.linspace(3.0, 0.1, d)
    return (rng.normal(size=(n, d)) * scales).astype(np.float32)


def _ds(vecs: np.ndarray, blocks: int = 5) -> "rd.Dataset":
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
        "embedding": pa.array(list(vecs)),
    })).repartition(blocks)


class TestMoments:
    def test_matches_numpy_any_block_layout(self):
        vecs = _data()
        x = vecs.astype(np.float64)
        want_mean = x.mean(axis=0)
        want_cov = np.cov(x, rowvar=False, ddof=1)
        for blocks in (1, 4, 13):
            n, mean, cov = embedding_moments(_ds(vecs, blocks))
            assert n == len(vecs)
            np.testing.assert_allclose(mean, want_mean, atol=1e-9)
            np.testing.assert_allclose(cov, want_cov, atol=1e-8)

    def test_empty(self):
        empty = rd.from_arrow(pa.table({
            "embedding": pa.array([], pa.list_(pa.float64()))}))
        n, mean, cov = embedding_moments(empty)
        assert n == 0 and mean.size == 0 and cov.size == 0


class TestPCA:
    def test_matches_single_process_pca(self):
        vecs = _data()
        model = pca_train(_ds(vecs), 4)
        x = vecs.astype(np.float64)
        cov = np.cov(x, rowvar=False, ddof=1)
        vals, vecs_np = np.linalg.eigh(cov)
        order = np.argsort(vals)[::-1][:4]
        np.testing.assert_allclose(model["explained_variance"],
                                   vals[order], atol=1e-8)
        for ki in range(4):
            ref = vecs_np[:, order[ki]]
            got = model["components"][ki]
            # same axis up to sign; engine pins the sign
            dot = abs(float(ref @ got))
            np.testing.assert_allclose(dot, 1.0, atol=1e-8)
            assert got[np.abs(got).argmax()] > 0

    def test_components_orthonormal(self):
        model = pca_train(_ds(_data()), 6)
        g = model["components"] @ model["components"].T
        np.testing.assert_allclose(g, np.eye(6), atol=1e-8)

    def test_projection_pipeline(self):
        vecs = _data(300)
        ds = _ds(vecs, 4)
        model = pca_train(ds, 3)
        out = pca_project(ds, model).to_pandas().sort_values("vec_id")
        proj = np.stack(out["pca"].to_numpy())
        want = (vecs.astype(np.float64) - model["mean"]) \
            @ model["components"].T
        np.testing.assert_allclose(proj, want, atol=1e-9)
        # projected variance equals the explained variances
        np.testing.assert_allclose(proj.var(axis=0, ddof=1),
                                   model["explained_variance"], atol=1e-8)
