"""Harmonic / Katz / LPA (stages/centrality.py) vs brute force."""

from __future__ import annotations

from collections import Counter, deque

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from textgraphs_ray.stages.centrality import (harmonic_centrality,
                                              katz_centrality,
                                              lpa_communities)


def _edges_ds(pairs):
    return rd.from_arrow(pa.table({
        "u": pa.array([p[0] for p in pairs], pa.int64()),
        "v": pa.array([p[1] for p in pairs], pa.int64())}))


def _rand_digraph(seed, n_nodes=20, n_edges=50):
    rng = np.random.default_rng(seed)
    es = set()
    while len(es) < n_edges:
        a, b = (int(x) for x in rng.integers(0, n_nodes, 2))
        if a != b:
            es.add((a, b))
    return sorted(es)


def _adj_undirected(pairs):
    adj: dict[int, set] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


def _brute_harmonic(pairs, hops=4):
    adj = _adj_undirected(pairs)
    out = {}
    for s in adj:
        dist = {s: 0}
        q = deque([s])
        while q:
            x = q.popleft()
            if dist[x] >= hops:
                continue
            for y in adj[x]:
                if y not in dist:
                    dist[y] = dist[x] + 1
                    q.append(y)
        reached = [d for n, d in dist.items() if d >= 1]
        out[s] = (sum(12 // d for d in reached), len(reached))
    return out


def _brute_katz(pairs, rounds=3):
    nodes = sorted({x for p in pairs for x in p})
    p = {n: 1 for n in nodes}
    for k in range(1, rounds + 1):
        new = {n: 16 ** k for n in nodes}
        for a, b in pairs:
            new[b] += p[a]
        p = new
    return p


def _brute_lpa(pairs, rounds=2):
    adj = _adj_undirected(pairs)
    lab = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        for n in adj:
            cnt = Counter(lab[x] for x in adj[n])
            best = sorted(((-c, l) for l, c in cnt.items()))[0][1]
            new[n] = best
        lab = new
    return lab


@pytest.mark.parametrize("seed", [2, 19])
def test_harmonic_matches_bfs(seed):
    pairs = _rand_digraph(seed)
    got = {r["node"]: (r["harmonic_x12"], r["n_reached"])
           for r in harmonic_centrality(_edges_ds(pairs),
                                        hops=4).take_all()}
    assert got == _brute_harmonic(pairs)


def test_harmonic_path_graph_closed_form():
    # path 0-1-2-3-4-5: node 0 reaches d=1..4 → 12+6+4+3 = 25
    pairs = [(i, i + 1) for i in range(5)]
    got = {r["node"]: (r["harmonic_x12"], r["n_reached"])
           for r in harmonic_centrality(_edges_ds(pairs)).take_all()}
    assert got[0] == (25, 4)
    assert got[2] == (12 + 12 + 6 + 6 + 4, 5)


@pytest.mark.parametrize("seed", [2, 19])
def test_katz_matches_integer_recurrence(seed):
    pairs = _rand_digraph(seed)
    got = {r["node"]: r["katz_x4096"]
           for r in katz_centrality(_edges_ds(pairs),
                                    rounds=3).take_all()}
    assert got == _brute_katz(pairs)


def test_katz_star_closed_form():
    # edges i -> 0 for i in 1..4: leaves have no in-edges so x_k = 1
    # always; x_3(0) = 1 + 4α → p3(0) = 4096 + 4·256 = 5120
    pairs = [(i, 0) for i in range(1, 5)]
    got = {r["node"]: r["katz_x4096"]
           for r in katz_centrality(_edges_ds(pairs)).take_all()}
    assert got[0] == 4096 + 4 * 256
    assert all(got[i] == 4096 for i in range(1, 5))


@pytest.mark.parametrize("seed", [5, 29])
def test_lpa_matches_synchronous_brute(seed):
    pairs = _rand_digraph(seed, n_nodes=16, n_edges=36)
    got = {r["node"]: r["label"]
           for r in lpa_communities(_edges_ds(pairs),
                                    rounds=2).take_all()}
    assert got == _brute_lpa(pairs)


def test_lpa_two_cliques_converge_to_min_ids():
    cl1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    cl2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    got = {r["node"]: r["label"]
           for r in lpa_communities(_edges_ds(cl1 + cl2),
                                    rounds=2).take_all()}
    assert got == _brute_lpa(cl1 + cl2)
    assert set(got[n] for n in range(4)) == {0}
    assert set(got[n] for n in range(10, 14)) == {10}


def test_eccentricity_path_graph():
    from textgraphs_ray.stages.centrality import eccentricity

    # path 0-1-2-3-4-5, hops=4: node 0 reaches 1..4 (ecc 4);
    # node 2 reaches everything, farthest d=3
    pairs = [(i, i + 1) for i in range(5)]
    got = {r["node"]: (r["ecc"], r["n_reached"])
           for r in eccentricity(_edges_ds(pairs), hops=4).take_all()}
    assert got[0] == (4, 4)
    assert got[2] == (3, 5)


def test_eccentricity_matches_bfs():
    from textgraphs_ray.stages.centrality import eccentricity

    pairs = _rand_digraph(11)
    adj = _adj_undirected(pairs)
    got = {r["node"]: (r["ecc"], r["n_reached"])
           for r in eccentricity(_edges_ds(pairs), hops=4).take_all()}
    want = {}
    for s, (_, n) in _brute_harmonic(pairs, hops=4).items():
        from collections import deque
        dist = {s: 0}
        q = deque([s])
        while q:
            x = q.popleft()
            if dist[x] >= 4:
                continue
            for y in adj[x]:
                if y not in dist:
                    dist[y] = dist[x] + 1
                    q.append(y)
        ds = [d for d in dist.values() if d >= 1]
        want[s] = (max(ds), len(ds))
    assert got == want


def _brute_stress(pairs, hops=4):
    adj = _adj_undirected(pairs)
    stress = {n: 0 for n in adj}
    for s in adj:
        # capped BFS: depth table
        dist = {s: 0}
        order = [s]
        q = deque([s])
        while q:
            x = q.popleft()
            if dist[x] >= hops:
                continue
            for y in adj[x]:
                if y not in dist:
                    dist[y] = dist[x] + 1
                    order.append(y)
                    q.append(y)
        # forward sigma over the capped BFS DAG
        sig = {n: 0 for n in dist}
        sig[s] = 1
        for x in order[1:]:
            sig[x] = sum(sig[p] for p in adj[x]
                         if p in dist and dist[p] == dist[x] - 1)
        # backward rho: capped DAG path-segments leaving v
        rho = {n: 0 for n in dist}
        for x in sorted(dist, key=lambda n: -dist[n]):
            for w in adj[x]:
                if w in dist and dist[w] == dist[x] + 1:
                    rho[x] += 1 + rho[w]
        for vtx in dist:
            if vtx != s:
                stress[vtx] += sig[vtx] * rho[vtx]
    return stress


def test_stress_path_graph_closed_form():
    from textgraphs_ray.stages.centrality import stress_centrality

    # path 0-1-2-3: with hops=4 every s-t pair's unique path counts;
    # node 1 is interior to (0,2), (0,3), (2,0), (3,0) → stress 4
    pairs = [(i, i + 1) for i in range(3)]
    got = {r["node"]: r["stress"] for r in stress_centrality(
        _edges_ds(pairs), hops=4).take_all()}
    assert got[1] == 4 and got[2] == 4
    assert got[0] == 0 and got[3] == 0


@pytest.mark.parametrize("seed", [2, 19, 33])
def test_stress_matches_brute(seed):
    from textgraphs_ray.stages.centrality import stress_centrality

    pairs = _rand_digraph(seed, n_nodes=14, n_edges=26)
    got = {r["node"]: r["stress"] for r in stress_centrality(
        _edges_ds(pairs), hops=4).take_all()}
    want = _brute_stress(pairs, hops=4)
    # the engine emits every reached (non-source) node incl. zeros
    for n, w in want.items():
        assert got.get(n, 0) == w, n


def test_stress_cap_binds():
    from textgraphs_ray.stages.centrality import stress_centrality

    # path of 7 nodes at hops=2: only length-≤2 paths count
    pairs = [(i, i + 1) for i in range(6)]
    got = {r["node"]: r["stress"] for r in stress_centrality(
        _edges_ds(pairs), hops=2).take_all()}
    want = _brute_stress(pairs, hops=2)
    for n, w in want.items():
        assert got.get(n, 0) == w, n


def test_harmonic_driver_plan_parity():
    from textgraphs_ray.stages.centrality import (
        harmonic_centrality, harmonic_centrality_driver)

    pairs = _rand_digraph(23, n_nodes=24, n_edges=60)
    a = {r["node"]: (r["harmonic_x12"], r["n_reached"])
         for r in harmonic_centrality(_edges_ds(pairs),
                                      hops=4).take_all()}
    b = {r["node"]: (r["harmonic_x12"], r["n_reached"])
         for r in harmonic_centrality_driver(_edges_ds(pairs),
                                             hops=4).take_all()}
    assert a == b


def test_harmonic_driver_guard():
    from textgraphs_ray.stages.centrality import (
        harmonic_centrality_driver)

    pairs = [(i, i + 1) for i in range(20)]
    with pytest.raises(ValueError):
        harmonic_centrality_driver(_edges_ds(pairs), max_edges=10)
