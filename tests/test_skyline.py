"""skyline (stages/skyline.py) vs a brute-force dominance oracle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from textgraphs_ray.stages.skyline import (_skyline_mask_2d,
                                           _skyline_mask_nd, skyline)


def _brute(points: np.ndarray) -> np.ndarray:
    """All-minimized dominance oracle (NOT EXISTS semantics)."""
    n = len(points)
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            le = (points[j] <= points[i]).all()
            lt = (points[j] < points[i]).any()
            if le and lt:
                keep[i] = False
                break
    return keep


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_mask_2d_matches_brute_force(seed):
    rng = np.random.default_rng(seed)
    # low-cardinality ints force plenty of ties and exact duplicates
    pts = rng.integers(0, 8, size=(120, 2)).astype(np.float64)
    u, codes = np.unique(pts, axis=0, return_inverse=True)
    got_u = _skyline_mask_2d(u[:, 0], u[:, 1])
    assert (got_u[codes] == _brute(pts)).all()


@pytest.mark.parametrize("d", [3, 4])
def test_mask_nd_matches_brute_force(d):
    rng = np.random.default_rng(7)
    pts = rng.integers(0, 5, size=(80, d)).astype(np.float64)
    u, codes = np.unique(pts, axis=0, return_inverse=True)
    got_u = _skyline_mask_nd([u[:, k] for k in range(d)])
    assert (got_u[codes] == _brute(pts)).all()


def test_skyline_dataset_min_max_mixed(ray_session):
    rng = np.random.default_rng(3)
    price = rng.integers(0, 50, 300).astype(np.float64)
    size = rng.integers(0, 20, 300)
    ds = rd.from_arrow(pa.table({
        "id": pa.array(np.arange(300)),
        "price": pa.array(price),
        "size": pa.array(size)})).repartition(8)
    got = skyline(ds, min_cols=["price"], max_cols=["size"]).take_all()
    keep = _brute(np.stack([price, -size.astype(np.float64)], axis=1))
    want = set(np.flatnonzero(keep).tolist())
    assert {r["id"] for r in got} == want
    # duplicates on the frontier are all kept
    assert len(got) == int(keep.sum())


def test_skyline_requires_objectives(ray_session):
    ds = rd.from_arrow(pa.table({"x": pa.array([1.0])}))
    with pytest.raises(ValueError):
        skyline(ds)
