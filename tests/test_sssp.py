"""Hop-bounded weighted SSSP (stages/scc.py sssp / sssp_distributed):
brute-force goldens, plan parity, weighted transition-edge extraction."""

from __future__ import annotations

import itertools

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from textgraphs_ray.stages.scc import (order_transition_edges, sssp,
                                       sssp_distributed)


def _edges_ds(triples):
    u, v, w = (list(x) for x in zip(*triples)) if triples else ([], [], [])
    return rd.from_arrow(pa.table({"u": pa.array(u, pa.int64()),
                                   "v": pa.array(v, pa.int64()),
                                   "w": pa.array(w, pa.int64())}))


def _golden(triples, source, max_hops):
    """Brute force: min cost over all paths with <= max_hops edges."""
    best = {source: 0}
    frontier = {source: 0}
    for _ in range(max_hops):
        nxt = {}
        for (a, b, w) in triples:
            if a in best:
                cand = best[a] + w
                if cand < best.get(b, float("inf")) \
                        and cand < nxt.get(b, float("inf")):
                    nxt[b] = cand
        if not nxt:
            break
        best.update(nxt)
    return best


def _as_map(ds):
    return {r["node"]: r["dist"] for r in ds.take_all()}


CASES = [
    # diamond: short heavy edge vs long light path
    [(1, 2, 10), (1, 3, 1), (3, 4, 1), (4, 2, 1)],
    # positive-weight cycle must not loop forever
    [(1, 2, 2), (2, 3, 2), (3, 1, 2), (3, 4, 5)],
    # chain longer than the hop bound (tail unreachable at 4 hops)
    [(i, i + 1, 1) for i in range(8)],
    # parallel relaxations through a hub
    [(1, 5, 3), (2, 5, 1), (5, 6, 2), (5, 7, 4), (1, 2, 1)],
]


@pytest.mark.parametrize("triples", CASES)
def test_sssp_driver_matches_bruteforce(ray_session, triples):
    got = _as_map(sssp(_edges_ds(triples), source=1, max_hops=4))
    assert got == _golden(triples, 1, 4)


@pytest.mark.parametrize("triples", CASES)
def test_sssp_distributed_matches_bruteforce(ray_session, triples):
    got = _as_map(sssp_distributed(_edges_ds(triples), source=1,
                                   max_hops=4, num_partitions=4))
    assert got == _golden(triples, 1, 4)


def test_sssp_plan_parity_random(ray_session):
    rng = np.random.default_rng(7)
    seen = {}
    for a, b, w in rng.integers(0, 25, size=(160, 3)):
        if a != b:
            seen.setdefault((int(a), int(b)), int(w) + 1)
    triples = sorted((a, b, w) for (a, b), w in seen.items())
    a = _as_map(sssp(_edges_ds(triples), source=0, max_hops=5))
    b = _as_map(sssp_distributed(_edges_ds(triples), source=0,
                                 max_hops=5, num_partitions=4))
    assert a == b == _golden(triples, 0, 5)


def test_sssp_source_only(ray_session):
    # source with no outgoing edges: just itself at distance 0
    got = _as_map(sssp(_edges_ds([(5, 6, 1)]), source=9, max_hops=3))
    assert got == {9: 0}


def test_sssp_driver_cap(ray_session):
    with pytest.raises(ValueError, match="max_edges"):
        sssp(_edges_ds([(1, 2, 1), (2, 3, 1)]), source=1, max_hops=2,
             max_edges=1)


def test_weighted_transition_edges_min_weight(ray_session):
    # order 1 emits 5->17 twice (lines 1->2 and 3->4) with dest
    # weights 9 then 4: the edge keeps the MIN.  Duplicate seq 2
    # joins crosswise from line 1.
    ds = rd.from_arrow(pa.table({
        "o": pa.array([1, 1, 1, 1, 1], pa.int64()),
        "i": pa.array([1, 2, 2, 3, 4], pa.int64()),
        "p": pa.array([5, 17, 3, 5, 17], pa.int64()),
        "q": pa.array([7, 9, 2, 6, 4], pa.int64()),
    }))
    got = sorted((r["u"], r["v"], r["w"])
                 for r in order_transition_edges(
                     ds, bucket_col="o", seq_col="i", item_col="p",
                     mod=1009, weight_col="q",
                     num_partitions=2).take_all())
    # 5->17 (w=min(9,4)=4), 5->3 (w=2), 17->5 (w=6), 3->5 (w=6),
    # 5->17 again folded in
    assert got == [(3, 5, 6), (5, 3, 2), (5, 17, 4), (17, 5, 6)]
