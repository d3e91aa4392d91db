"""Triangle counting (stages/triangle.py)."""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pyarrow as pa
import ray.data as rd

from textgraphs_ray.stages.triangle import (cooccurrence_edges,
                                            triangle_counts)


def _edges_ds(pairs):
    return rd.from_arrow(pa.table({
        "u": pa.array([p[0] for p in pairs], pa.int64()),
        "v": pa.array([p[1] for p in pairs], pa.int64())}))


def _brute(pairs):
    es = set(pairs)
    nodes = sorted({x for p in pairs for x in p})
    cnt = {n: 0 for n in nodes}
    for a, b, c in combinations(nodes, 3):
        if (a, b) in es and (a, c) in es and (b, c) in es:
            for n in (a, b, c):
                cnt[n] += 1
    return {n: c for n, c in cnt.items() if c > 0}


def test_planted_triangles():
    # K4 on {0,1,2,3} (4 triangles, each node in 3) + a pendant edge
    pairs = [(a, b) for a, b in combinations(range(4), 2)] + [(3, 9)]
    got = {r["node"]: r["n_triangles"]
           for r in triangle_counts(_edges_ds(pairs)).take_all()}
    assert got == _brute(pairs) == {0: 3, 1: 3, 2: 3, 3: 3}


def test_random_graph_matches_brute_force():
    rng = np.random.default_rng(13)
    pairs = sorted({tuple(sorted(p)) for p in
                    rng.integers(0, 30, (200, 2)) if p[0] != p[1]})
    got = {r["node"]: r["n_triangles"]
           for r in triangle_counts(_edges_ds(pairs),
                                    num_partitions=5).take_all()}
    assert got == _brute(pairs)


def test_triangle_free_graph_is_empty():
    # a path graph has no triangles
    pairs = [(i, i + 1) for i in range(10)]
    assert triangle_counts(_edges_ds(pairs)).take_all() == []


def test_cooccurrence_edges_dedup_and_order():
    ds = rd.from_arrow(pa.table({
        "bkt": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "ent": pa.array([5, 3, 5, 3, 5], pa.int64())}))
    got = sorted((r["u"], r["v"]) for r in
                 cooccurrence_edges(ds, entity_col="ent",
                                    bucket_col="bkt").take_all())
    assert got == [(3, 5)]  # deduped across buckets, u < v


# ---- common_neighbor_pairs ------------------------------------------

def test_common_neighbors_vs_brute(ray_session):
    from collections import Counter
    from itertools import combinations

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from textgraphs_ray.stages.triangle import common_neighbor_pairs

    rng = np.random.default_rng(11)
    buckets = rng.integers(0, 30, 400)
    ents = rng.integers(0, 15, 400)
    ds = rd.from_arrow(pa.table({
        "b": pa.array(buckets.astype(np.int64)),
        "e": pa.array(ents.astype(np.int64))})).repartition(6)

    member = {}
    for b, e in zip(buckets.tolist(), ents.tolist()):
        member.setdefault(b, set()).add(e)
    cnt = Counter()
    for es in member.values():
        for u, v in combinations(sorted(es), 2):
            cnt[(u, v)] += 1
    want = sorted(((n, u, v) for (u, v), n in cnt.items()),
                  key=lambda t: (-t[0], t[1], t[2]))[:10]

    got = common_neighbor_pairs(ds, entity_col="e", bucket_col="b",
                                k=10).take_all()
    assert [(r["n_common"], r["u"], r["v"]) for r in got] == want


# ---- k_core ---------------------------------------------------------

import pytest  # noqa: E402

def _kcore_edges(rng, n, m):
    import numpy as np
    seen = set()
    while len(seen) < m:
        a, b = rng.integers(0, n, 2)
        if a != b:
            seen.add((min(a, b), max(a, b)))
    return sorted(seen)


@pytest.mark.parametrize("k", [2, 3])
def test_k_core_matches_networkx(ray_session, k):
    import networkx as nx
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from textgraphs_ray.stages.triangle import k_core

    rng = np.random.default_rng(5)
    edges = _kcore_edges(rng, 40, 120)
    ds = rd.from_arrow(pa.table({
        "u": pa.array([e[0] for e in edges], pa.int64()),
        "v": pa.array([e[1] for e in edges], pa.int64())})
    ).repartition(4)
    got = {r["node"]: r["degree"]
           for r in k_core(ds, k=k).take_all()}

    g = nx.Graph(edges)
    core = nx.k_core(g, k)
    want = {n: d for n, d in core.degree()}
    assert got == want


def test_k_core_empty_result_keeps_schema(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from textgraphs_ray.stages.triangle import k_core

    # a path graph has no 2-core
    ds = rd.from_arrow(pa.table({
        "u": pa.array([0, 1, 2], pa.int64()),
        "v": pa.array([1, 2, 3], pa.int64())}))
    out = k_core(ds, k=2)
    assert out.count() == 0
    assert set(out.schema().names) == {"node", "degree"}


def test_adamic_adar_vs_brute(ray_session):
    import math
    from collections import defaultdict

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from textgraphs_ray.stages.triangle import common_neighbor_pairs

    rng = np.random.default_rng(21)
    buckets = rng.integers(0, 25, 300)
    ents = rng.integers(0, 12, 300)
    ds = rd.from_arrow(pa.table({
        "b": pa.array(buckets.astype(np.int64)),
        "e": pa.array(ents.astype(np.int64))})).repartition(5)

    member = defaultdict(set)
    for b, e in zip(buckets.tolist(), ents.tolist()):
        member[b].add(e)
    aa = defaultdict(float)
    for es in member.values():
        if len(es) < 2:
            continue
        w = 1.0 / math.log(len(es))
        ss = sorted(es)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                aa[(ss[i], ss[j])] += w
    want = sorted(((round(s, 6), u, v) for (u, v), s in aa.items()),
                  key=lambda t: (-t[0], t[1], t[2]))[:10]

    got = common_neighbor_pairs(ds, entity_col="e", bucket_col="b",
                                k=10, weight="adamic_adar").take_all()
    got_t = [(r["aa"], r["u"], r["v"]) for r in got]
    assert [(u, v) for _, u, v in got_t] == [(u, v) for _, u, v in want]
    for (ga, _, _), (wa, _, _) in zip(got_t, want):
        assert abs(ga - wa) < 1e-5


def test_bfs_hops_matches_networkx(ray_session):
    import networkx as nx
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from textgraphs_ray.stages.triangle import bfs_hops

    rng = np.random.default_rng(13)
    edges = _kcore_edges(rng, 60, 90)   # sparse: multi-hop distances
    ds = rd.from_arrow(pa.table({
        "u": pa.array([e[0] for e in edges], pa.int64()),
        "v": pa.array([e[1] for e in edges], pa.int64())})
    ).repartition(4)
    src = edges[0][0]
    got = {r["node"]: r["dist"]
           for r in bfs_hops(ds, source=src, max_hops=5,
                             num_partitions=4).take_all()}
    g = nx.Graph(edges)
    want = {n: d for n, d in
            nx.single_source_shortest_path_length(g, src, cutoff=5)
            .items()}
    assert got == want


def test_bfs_hops_cap_binds(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from textgraphs_ray.stages.triangle import bfs_hops

    # path graph 0-1-2-3-4: cap 2 reaches only 0,1,2
    ds = rd.from_arrow(pa.table({
        "u": pa.array([0, 1, 2, 3], pa.int64()),
        "v": pa.array([1, 2, 3, 4], pa.int64())}))
    got = {r["node"]: r["dist"]
           for r in bfs_hops(ds, source=0, max_hops=2,
                             num_partitions=2).take_all()}
    assert got == {0: 0, 1: 1, 2: 2}


class TestKTruss:
    def _run(self, edge_list, k):
        import pyarrow as pa
        import ray.data as rd

        from textgraphs_ray.stages.triangle import k_truss
        e = pa.table({"u": pa.array([a for a, b in edge_list], pa.int64()),
                      "v": pa.array([b for a, b in edge_list], pa.int64())})
        out = k_truss(rd.from_arrow(e), k=k).to_pandas()
        return {(int(r.u), int(r.v)): int(r.support)
                for r in out.itertuples(index=False)}

    def test_matches_networkx(self):
        import networkx as nx
        rng = __import__("random").Random(3)
        edges = set()
        # a few planted cliques + random noise edges
        for base in (0, 10, 20):
            for i in range(5):
                for j in range(i + 1, 5):
                    edges.add((base + i, base + j))
        while len(edges) < 60:
            a, b = rng.randrange(40), rng.randrange(40)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        for k in (3, 4, 5):
            got = self._run(sorted(edges), k)
            g = nx.Graph()
            g.add_edges_from(edges)
            want = nx.k_truss(g, k)
            want_edges = {(min(a, b), max(a, b))
                          for a, b in want.edges()}
            assert set(got) == want_edges, k
            # support values: every kept edge closes >= k-2 triangles
            # inside the truss
            for (a, b), s in got.items():
                n_tri = len(set(want.neighbors(a))
                            & set(want.neighbors(b)))
                assert s == n_tri, (a, b)

    def test_triangle_free_graph_empties(self):
        got = self._run([(0, 1), (1, 2), (2, 3)], 3)
        assert got == {}

    def test_k_below_3_raises(self):
        import pytest
        with pytest.raises(ValueError):
            self._run([(0, 1)], 2)


class TestGreedyMIS:
    def _sequential(self, edges, nodes):
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        taken = set()
        for v in sorted(nodes):
            if not (adj.get(v, set()) & taken):
                taken.add(v)
        return taken

    def _run(self, edges):
        import pyarrow as pa
        import ray.data as rd

        from textgraphs_ray.stages.triangle import \
            maximal_independent_set
        e = pa.table({"u": pa.array([a for a, b in edges], pa.int64()),
                      "v": pa.array([b for a, b in edges], pa.int64())})
        out = maximal_independent_set(rd.from_arrow(e))
        return {r["node"] for r in out.take_all()}

    def test_matches_sequential_greedy(self):
        import random
        rng = random.Random(13)
        for trial in range(3):
            edges = sorted({(min(a, b), max(a, b))
                            for a, b in ((rng.randrange(60),
                                          rng.randrange(60))
                                         for _ in range(150))
                            if a != b})
            nodes = {x for e in edges for x in e}
            got = self._run(edges)
            want = self._sequential(edges, nodes)
            assert got == want, trial

    def test_path_graph_alternates(self):
        # 0-1-2-3-4 chain: greedy takes 0, 2, 4
        assert self._run([(0, 1), (1, 2), (2, 3), (3, 4)]) == {0, 2, 4}

    def test_round_budget_exhaustion_raises(self):
        # an id chain needs one round per taken node; with the budget
        # capped below that, the fixpoint must FAIL LOUDLY rather than
        # silently return an independent-but-non-maximal set
        import pyarrow as pa
        import pytest
        import ray.data as rd

        from textgraphs_ray.stages.triangle import \
            maximal_independent_set
        edges = [(i, i + 1) for i in range(8)]
        e = pa.table({"u": pa.array([a for a, _ in edges], pa.int64()),
                      "v": pa.array([b for _, b in edges], pa.int64())})
        with pytest.raises(RuntimeError, match="did not converge"):
            maximal_independent_set(rd.from_arrow(e), max_rounds=1)

    def test_star_takes_min_id(self):
        # greedy by ascending id always takes the smallest node first
        assert self._run([(0, 5), (0, 6), (0, 7)]) == {0}
        assert self._run([(5, 9), (5, 8), (5, 7)]) == {5}
        # leaves beat the center when every leaf id is smaller
        assert self._run([(9, 1), (9, 2), (9, 3)]) == {1, 2, 3}


def test_clustering_coefficient_closed_forms():
    from textgraphs_ray.stages.triangle import clustering_coefficient

    # K4 (cc = 1 everywhere) + pendant node 9 on 3 (deg 1 → cc 0)
    pairs = [(a, b) for a, b in combinations(range(4), 2)] + [(3, 9)]
    got = {r["node"]: (r["deg"], r["n_tri"], r["cc"])
           for r in clustering_coefficient(_edges_ds(pairs)).take_all()}
    assert got[0] == (3, 3, 1.0)
    assert got[3] == (4, 3, 0.5)   # 3 closed of C(4,2)=6 wedges
    assert got[9] == (1, 0, 0.0)


def test_clustering_coefficient_matches_brute():
    from textgraphs_ray.stages.triangle import clustering_coefficient

    rng = np.random.default_rng(7)
    pairs = sorted({tuple(sorted(p)) for p in
                    rng.integers(0, 25, (150, 2)) if p[0] != p[1]})
    tri = _brute(pairs)
    deg: dict[int, int] = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    got = {r["node"]: (r["deg"], r["n_tri"], r["cc"])
           for r in clustering_coefficient(
               _edges_ds(pairs), num_partitions=5).take_all()}
    assert set(got) == set(deg)
    for n, d in deg.items():
        t = tri.get(n, 0)
        cc = round(2.0 * t / (d * (d - 1)), 6) if d >= 2 else 0.0
        assert got[n] == (d, t, cc), n


def test_four_cycle_k4_and_path():
    from textgraphs_ray.stages.triangle import four_cycle_count

    k4 = [(a, b) for a, b in combinations(range(4), 2)]
    row = four_cycle_count(_edges_ds(k4)).take_all()[0]
    assert row["c4"] == 3 and row["n_quad_pairs"] == 6
    path = [(i, i + 1) for i in range(6)]
    assert four_cycle_count(_edges_ds(path)).take_all()[0]["c4"] == 0


def test_four_cycle_matches_brute():
    from textgraphs_ray.stages.triangle import four_cycle_count

    rng = np.random.default_rng(31)
    pairs = sorted({tuple(sorted(p)) for p in
                    rng.integers(0, 18, (70, 2)) if p[0] != p[1]})
    adj: dict[int, set] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    want = 0
    for i, x in enumerate(nodes):
        for z in nodes[i + 1:]:
            c = len(adj[x] & adj[z])
            want += c * (c - 1) // 2
    row = four_cycle_count(_edges_ds(pairs)).take_all()[0]
    assert row["n_quad_pairs"] == want
    assert row["c4"] == want // 2


def test_jaccard_pairs_matches_brute():
    from textgraphs_ray.stages.triangle import common_neighbor_pairs

    rng = np.random.default_rng(41)
    rows = [(int(b), int(e)) for b, e in
            zip(rng.integers(0, 15, 400), rng.integers(0, 12, 400))]
    ds = rd.from_arrow(pa.table({
        "bkt": pa.array([r[0] for r in rows], pa.int64()),
        "ent": pa.array([r[1] for r in rows], pa.int64())}))
    got = [(r["u"], r["v"], r["jac"]) for r in
           common_neighbor_pairs(ds, entity_col="ent",
                                 bucket_col="bkt", k=10,
                                 weight="jaccard").take_all()]
    sets: dict[int, set] = {}
    for b, e in rows:
        sets.setdefault(e, set()).add(b)
    ents = sorted(sets)
    brute = []
    for i, u in enumerate(ents):
        for v in ents[i + 1:]:
            c = len(sets[u] & sets[v])
            if c:
                brute.append((
                    round(c / (len(sets[u]) + len(sets[v]) - c), 6),
                    u, v))
    brute.sort(key=lambda t: (-t[0], t[1], t[2]))
    assert got == [(u, v, j) for j, u, v in brute[:10]]


def test_rich_club_closed_forms():
    from textgraphs_ray.stages.triangle import rich_club

    # K4 on 0..3 + pendant 3-9: degrees 3,3,3,4,1
    pairs = [(a, b) for a, b in combinations(range(4), 2)] + [(3, 9)]
    got = {r["k"]: (r["n_k"], r["e_k"], r["phi"])
           for r in rich_club(_edges_ds(pairs), max_k=4).take_all()}
    # k=0: all 5 nodes, all 7 edges → 14/20 = 0.7
    assert got[0] == (5, 7, 0.7)
    # k=2: nodes with deg>2 = {0,1,2,3}; edges among them = K4
    assert got[2] == (4, 6, 1.0)
    # k=3: only node 3 → fewer than 2 nodes → 0.0
    assert got[3] == (1, 0, 0.0)
    assert got[4] == (0, 0, 0.0)


def test_rich_club_matches_brute():
    from textgraphs_ray.stages.triangle import rich_club

    rng = np.random.default_rng(3)
    pairs = sorted({tuple(sorted(p)) for p in
                    rng.integers(0, 20, (80, 2)) if p[0] != p[1]})
    deg: dict[int, int] = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    got = {r["k"]: (r["n_k"], r["e_k"], r["phi"])
           for r in rich_club(_edges_ds(pairs), max_k=6).take_all()}
    for k in range(7):
        rich = {n for n, d in deg.items() if d > k}
        e = sum(1 for a, b in pairs if a in rich and b in rich)
        phi = (round(2.0 * e / (len(rich) * (len(rich) - 1)), 6)
               if len(rich) >= 2 else 0.0)
        assert got[k] == (len(rich), e, phi), k


def _brute_densest_peel(pairs, eps_num=3, eps_den=2):
    """Replay of the ε=1/2 parallel peel: returns the best round's
    {node: degree} under exact cross-multiplied density compare."""
    edges = set(pairs)
    best = None  # (m2, n, census)
    while edges:
        deg: dict[int, int] = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        n = len(deg)
        m2 = sum(deg.values())
        if best is None or m2 * best[1] > best[0] * n:
            best = (m2, n, dict(deg))
        thr = (3 * m2) // (2 * n)
        drop = {x for x, d in deg.items() if d <= thr}
        edges = {(a, b) for a, b in edges
                 if a not in drop and b not in drop}
    return best[2]


def test_densest_subgraph_planted_clique():
    from textgraphs_ray.stages.triangle import densest_subgraph

    # K6 on 0..5 (density 2.5) + a long sparse path 10..30
    clique = [(a, b) for a, b in combinations(range(6), 2)]
    path = [(i, i + 1) for i in range(10, 30)]
    got = {r["node"]: r["d"] for r in densest_subgraph(
        _edges_ds(clique + path)).take_all()}
    assert got == {i: 5 for i in range(6)}


def test_densest_subgraph_matches_peel_replay():
    from textgraphs_ray.stages.triangle import densest_subgraph

    for seed in (2, 27):
        rng = np.random.default_rng(seed)
        pairs = sorted({tuple(sorted(p)) for p in
                        rng.integers(0, 24, (70, 2)) if p[0] != p[1]})
        got = {r["node"]: r["d"] for r in densest_subgraph(
            _edges_ds(pairs), num_partitions=4).take_all()}
        assert got == _brute_densest_peel(pairs), seed


def test_densest_subgraph_density_bound():
    from textgraphs_ray.stages.triangle import densest_subgraph

    # 3-approximation sanity on a graph with known densest part
    pairs = ([(a, b) for a, b in combinations(range(5), 2)]
             + [(0, 99), (99, 98)])
    rows = densest_subgraph(_edges_ds(pairs)).take_all()
    nodes = {r["node"] for r in rows}
    e_in = sum(1 for a, b in pairs if a in nodes and b in nodes)
    # optimum is K5 at density 2.0; the peel must return >= 2/3
    assert e_in / len(nodes) >= 2.0 / 3


def test_coreness_matches_networkx():
    import networkx as nx

    from textgraphs_ray.stages.triangle import coreness

    for seed in (4, 21):
        rng = np.random.default_rng(seed)
        pairs = sorted({tuple(sorted(p)) for p in
                        rng.integers(0, 30, (120, 2)) if p[0] != p[1]})
        got = {r["node"]: r["core"] for r in coreness(
            _edges_ds(pairs), rounds=30).take_all()}
        g = nx.Graph(pairs)
        assert got == nx.core_number(g), seed


def test_coreness_clique_plus_tail():
    from textgraphs_ray.stages.triangle import coreness

    # K5 (core 4) with a path tail (core 1)
    pairs = ([(a, b) for a, b in combinations(range(5), 2)]
             + [(4, 10), (10, 11), (11, 12)])
    got = {r["node"]: r["core"] for r in coreness(
        _edges_ds(pairs), rounds=20).take_all()}
    assert all(got[i] == 4 for i in range(5))
    assert got[10] == got[11] == got[12] == 1
