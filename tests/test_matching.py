"""One-to-one assignment (stages/matching.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from textgraphs_ray.stages.matching import (greedy_weight_matching,
                                            mutual_best_pairs)


def _pairs_ds(triples):
    return rd.from_arrow(pa.table({
        "u": pa.array([t[0] for t in triples], pa.int64()),
        "v": pa.array([t[1] for t in triples], pa.int64()),
        "w": pa.array([t[2] for t in triples], pa.int64())}))


def _brute_greedy(triples):
    """Sequential greedy scan by (w DESC, u ASC, v ASC)."""
    matched: set[int] = set()
    out = []
    for u, v, w in sorted(triples, key=lambda t: (-t[2], t[0], t[1])):
        if u not in matched and v not in matched:
            matched.add(u)
            matched.add(v)
            out.append((u, v, w))
    return sorted(out)


def _brute_mutual(triples):
    best: dict[int, tuple] = {}
    for u, v, w in triples:
        for n in (u, v):
            cand = (-w, u, v)
            if n not in best or cand < best[n]:
                best[n] = cand
    out = []
    for u, v, w in triples:
        if best[u] == (-w, u, v) and best[v] == (-w, u, v):
            out.append((u, v, w))
    return sorted(out)


def _rand_graph(seed, n_nodes=24, n_pairs=60):
    rng = np.random.default_rng(seed)
    seen = {}
    while len(seen) < n_pairs:
        a, b = rng.integers(0, n_nodes, 2)
        if a == b:
            continue
        u, v = int(min(a, b)), int(max(a, b))
        seen.setdefault((u, v), int(rng.integers(1, 40)))
    return [(u, v, w) for (u, v), w in seen.items()]


def test_mutual_best_planted():
    # 1-2 is mutual best; 3 prefers 2 but 2 prefers 1; 3-4 mutual
    triples = [(1, 2, 10), (2, 3, 7), (3, 4, 8), (4, 5, 3)]
    got = sorted((r["u"], r["v"], r["w"]) for r in
                 mutual_best_pairs(_pairs_ds(triples)).take_all())
    assert got == [(1, 2, 10), (3, 4, 8)] == _brute_mutual(triples)


def test_mutual_best_tie_breaks_by_pair_order():
    # equal weights: (1,2) beats (1,3) and (2,3) under (u, v) asc
    triples = [(1, 2, 5), (1, 3, 5), (2, 3, 5)]
    got = sorted((r["u"], r["v"], r["w"]) for r in
                 mutual_best_pairs(_pairs_ds(triples)).take_all())
    assert got == [(1, 2, 5)] == _brute_mutual(triples)


@pytest.mark.parametrize("seed", [7, 11, 23])
def test_greedy_driver_matches_sequential_scan(seed):
    triples = _rand_graph(seed)
    got = sorted((r["u"], r["v"], r["w"]) for r in
                 greedy_weight_matching(_pairs_ds(triples),
                                        plan="driver").take_all())
    assert got == _brute_greedy(triples)


@pytest.mark.parametrize("seed", [7, 31])
def test_greedy_distributed_equals_driver(seed):
    triples = _rand_graph(seed, n_nodes=18, n_pairs=40)
    ds = _pairs_ds(triples)
    drv = sorted((r["u"], r["v"], r["w"]) for r in
                 greedy_weight_matching(ds, plan="driver").take_all())
    dst = sorted((r["u"], r["v"], r["w"]) for r in
                 greedy_weight_matching(ds, plan="distributed",
                                        num_partitions=3).take_all())
    assert drv == dst == _brute_greedy(triples)


def test_greedy_is_maximal_matching():
    triples = _rand_graph(3, n_nodes=20, n_pairs=50)
    got = _brute_greedy(triples)
    matched = {n for p in got for n in p[:2]}
    assert len(matched) == 2 * len(got)  # node-disjoint
    for u, v, w in triples:              # maximal: no augmenting pair
        assert u in matched or v in matched


def test_driver_plan_guards_pair_bound():
    triples = _rand_graph(5)
    with pytest.raises(ValueError, match="max_pairs"):
        greedy_weight_matching(_pairs_ds(triples), plan="driver",
                               max_pairs=10).take_all()


def test_distributed_round_budget_raises():
    # a path of strictly decreasing weights matches one pair per
    # round at the head of the chain — 1 round cannot finish
    triples = [(i, i + 1, 100 - i) for i in range(8)]
    with pytest.raises(RuntimeError, match="did not converge"):
        greedy_weight_matching(_pairs_ds(triples), plan="distributed",
                               max_rounds=1).take_all()
