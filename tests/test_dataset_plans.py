"""Forced-plan parity for the de-drivered fixpoint loops.

Each peel/fixpoint operator selects between a bounded broadcast of the
per-round drop/accept set and a Dataset anti-``shuffle_join`` plan
(constant driver memory).  ``broadcast_max=0`` forces the Dataset plan
on every round; the outputs must be IDENTICAL to the broadcast/driver
plan — the plan-selection contract VERDICT r04 asked to pin.
"""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd


def _rand_edges(n_nodes: int, n_draws: int, seed: int):
    rng = random.Random(seed)
    return sorted({(min(a, b), max(a, b))
                   for a, b in ((rng.randrange(n_nodes),
                                 rng.randrange(n_nodes))
                                for _ in range(n_draws))
                   if a != b})


def _edges_ds(pairs):
    return rd.from_arrow(pa.table({
        "u": pa.array([a for a, _ in pairs], pa.int64()),
        "v": pa.array([b for _, b in pairs], pa.int64())}))


def _rows(ds, cols):
    return sorted(tuple(r[c] for c in cols) for r in ds.take_all())


@pytest.mark.parametrize("k", [2, 3])
def test_k_core_dataset_plan_parity(ray_session, k):
    from textgraphs_ray.stages.triangle import k_core

    pairs = _rand_edges(40, 120, seed=7)
    want = _rows(k_core(_edges_ds(pairs), k=k), ["node", "degree"])
    got = _rows(k_core(_edges_ds(pairs), k=k, broadcast_max=0),
                ["node", "degree"])
    assert got == want and len(want) > 0


def test_densest_dataset_plan_parity(ray_session):
    from textgraphs_ray.stages.triangle import densest_subgraph

    # planted K6 inside a sparse background: the peel must find it
    pairs = sorted(set(_rand_edges(50, 60, seed=11))
                   | {(a, b) for a in range(6) for b in range(6)
                      if a < b})
    want = _rows(densest_subgraph(_edges_ds(pairs)), ["node", "d"])
    got = _rows(densest_subgraph(_edges_ds(pairs), broadcast_max=0),
                ["node", "d"])
    assert got == want and len(want) >= 6


def test_mis_dataset_plan_parity(ray_session):
    from textgraphs_ray.stages.triangle import maximal_independent_set

    for seed in (3, 19):
        pairs = _rand_edges(45, 110, seed=seed)
        want = _rows(maximal_independent_set(
            _edges_ds(pairs), plan="broadcast"), ["node"])
        got = _rows(maximal_independent_set(
            _edges_ds(pairs), plan="dataset"), ["node"])
        # auto with broadcast_max=0 must select the Dataset plan and
        # still match (the plan-selection pin)
        auto = _rows(maximal_independent_set(
            _edges_ds(pairs), broadcast_max=0), ["node"])
        assert got == want == auto and len(want) > 0


def test_mis_dataset_plan_keeps_isolated_survivors(ray_session):
    from textgraphs_ray.stages.triangle import maximal_independent_set

    # 9's only neighbors are dropped in round 1 → it survives
    # edge-free and must still join the set (alive bookkeeping)
    pairs = [(0, 1), (1, 9), (2, 9), (0, 2)]
    got = _rows(maximal_independent_set(
        _edges_ds(pairs), plan="dataset"), ["node"])
    assert got == [(0,), (9,)]


def test_mis_dataset_plan_round_budget_raises(ray_session):
    from textgraphs_ray.stages.triangle import maximal_independent_set

    edges = _edges_ds([(i, i + 1) for i in range(8)])
    with pytest.raises(RuntimeError, match="did not converge"):
        maximal_independent_set(edges, plan="dataset", max_rounds=1)


def test_greedy_matching_dataset_plan_parity(ray_session):
    from textgraphs_ray.stages.matching import greedy_weight_matching

    rng = random.Random(23)
    triples = [(a, b, rng.randrange(1, 50))
               for a, b in _rand_edges(30, 80, seed=23)]
    ds = rd.from_arrow(pa.table({
        "u": pa.array([t[0] for t in triples], pa.int64()),
        "v": pa.array([t[1] for t in triples], pa.int64()),
        "w": pa.array([t[2] for t in triples], pa.int64())}))
    want = _rows(greedy_weight_matching(ds, plan="driver"),
                 ["u", "v", "w"])
    got = _rows(greedy_weight_matching(ds, plan="distributed",
                                       broadcast_max=0),
                ["u", "v", "w"])
    assert got == want and len(want) > 0


def test_collect_bounded_guard(ray_session):
    from textgraphs_ray.functions.bounded import (assert_bounded,
                                                  collect_bounded)

    ds = rd.from_arrow(pa.table({"x": pa.array(range(10), pa.int64())}))
    rows = collect_bounded(ds, 10, "raise the bound")
    assert len(rows) == 10
    with pytest.raises(ValueError, match="raise the bound"):
        collect_bounded(ds, 9, "raise the bound")
    assert assert_bounded(ds, 10, "hint") == 10
    with pytest.raises(ValueError, match="exceeds the 4-row bound"):
        assert_bounded(ds, 4, "hint")
