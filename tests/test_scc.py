"""Strongly connected components (stages/scc.py): networkx goldens,
driver/distributed plan parity, transition-edge extraction."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from textgraphs_ray.stages.scc import (order_transition_edges, scc,
                                       scc_distributed)


def _edges_ds(pairs):
    u, v = (list(x) for x in zip(*pairs)) if pairs else ([], [])
    return rd.from_arrow(pa.table({"u": pa.array(u, pa.int64()),
                                   "v": pa.array(v, pa.int64())}))


def _golden(pairs):
    import networkx as nx

    g = nx.DiGraph()
    g.add_edges_from(pairs)
    out = {}
    for comp in nx.strongly_connected_components(g):
        m = min(comp)
        for n in comp:
            out[n] = m
    return out


def _as_map(ds):
    return {r["node"]: r["scc_id"] for r in ds.take_all()}


CASES = [
    # two 3-cycles bridged one-way + a dangler
    [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4), (6, 7)],
    # pure DAG: every node a singleton
    [(1, 2), (1, 3), (2, 4), (3, 4)],
    # one giant cycle
    [(i, (i + 1) % 10) for i in range(10)],
    # directed path (worst case for label propagation)
    [(i, i + 1) for i in range(12)],
    # two disjoint cycles
    [(1, 2), (2, 1), (10, 11), (11, 12), (12, 10)],
]


@pytest.mark.parametrize("pairs", CASES)
def test_scc_driver_matches_networkx(ray_session, pairs):
    assert _as_map(scc(_edges_ds(pairs))) == _golden(pairs)


@pytest.mark.parametrize("pairs", CASES)
def test_scc_distributed_matches_networkx(ray_session, pairs):
    got = _as_map(scc_distributed(_edges_ds(pairs),
                                  num_partitions=4))
    assert got == _golden(pairs)


def test_scc_plan_parity_random(ray_session):
    rng = np.random.default_rng(11)
    pairs = {(int(a), int(b))
             for a, b in rng.integers(0, 40, size=(220, 2))
             if a != b}
    pairs = sorted(pairs)
    a = _as_map(scc(_edges_ds(pairs)))
    b = _as_map(scc_distributed(_edges_ds(pairs), num_partitions=4))
    assert a == b == _golden(pairs)


def test_scc_empty(ray_session):
    assert _as_map(scc(_edges_ds([]))) == {}


def test_scc_driver_cap(ray_session):
    with pytest.raises(ValueError, match="max_edges"):
        scc(_edges_ds([(1, 2), (2, 1)]), max_edges=1)


def test_order_transition_edges(ray_session):
    # order 1: lines 1,2,3 -> parts 5,17,5 ; order 2: lines 1,3 (gap)
    ds = rd.from_arrow(pa.table({
        "o": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "i": pa.array([1, 2, 3, 1, 3], pa.int64()),
        "p": pa.array([5, 17, 5, 8, 9], pa.int64()),
    }))
    got = sorted((r["u"], r["v"])
                 for r in order_transition_edges(
                     ds, bucket_col="o", seq_col="i", item_col="p",
                     mod=1009, num_partitions=2).take_all())
    # 5->17, 17->5 from order 1; order 2's line gap emits nothing
    assert got == [(5, 17), (17, 5)]


def test_order_transition_edges_mod_and_self_loop(ray_session):
    # parts 3 and 1012 collide mod 1009 -> self-loop dropped
    ds = rd.from_arrow(pa.table({
        "o": pa.array([1, 1, 1], pa.int64()),
        "i": pa.array([1, 2, 3], pa.int64()),
        "p": pa.array([3, 1012, 7], pa.int64()),
    }))
    got = sorted((r["u"], r["v"])
                 for r in order_transition_edges(
                     ds, bucket_col="o", seq_col="i", item_col="p",
                     mod=1009, num_partitions=2).take_all())
    assert got == [(3, 7)]
