"""stages/walks.py: deterministic walks — every hop follows an edge,
walk count and determinism pinned."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from textgraphs_ray.stages.walks import random_walks


def _edges(pairs):
    return rd.from_arrow(pa.table({
        "u": pa.array([a for a, b in pairs], pa.int64()),
        "v": pa.array([b for a, b in pairs], pa.int64())}))


def test_walks_follow_edges_and_are_deterministic(ray_session):
    rng = np.random.RandomState(5)
    pairs = sorted({(int(min(a, b)), int(max(a, b)))
                    for a, b in rng.randint(0, 30, (80, 2)) if a != b})
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = random_walks(_edges(pairs), length=5).take_all()
    walks = {}
    for r in out:
        walks.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
    assert set(walks) == set(adj)            # one walk per node
    for wid, w in walks.items():
        assert w[0] == wid
        assert len(w) == 6
        for s in range(1, 6):
            assert w[s] in adj[w[s - 1]], (wid, s)
    out2 = random_walks(_edges(pairs), length=5).take_all()
    assert sorted(map(tuple, (r.values() for r in out))) == \
        sorted(map(tuple, (r.values() for r in out2)))


def test_huge_node_ids_match_bigint_replay(ray_session):
    """Ids near 2^40 would overflow the UNREDUCED chooser product in
    int64 (walk_id·1315423911 wraps above ids ≈ 2^32.7); the mod-P
    pre-reduction keeps the vectorized hop equal to exact big-int
    arithmetic for any int64 id."""
    B = 1 << 40
    pairs = [(B + a, B + b) for a, b in
             [(0, 1), (0, 2), (0, 3), (1, 2), (2, 4), (3, 4)]]
    adj: dict[int, list[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    for k in adj:
        adj[k] = sorted(adj[k])

    def replay(wid: int, length: int) -> list[int]:
        # exact Python big-int arithmetic of the documented chooser
        v, out = wid, [wid]
        for t in range(1, length + 1):
            nb = adj[v]
            v = nb[((wid * 1315423911 + t * 2654435761 + v * 97)
                    % 1000003) % len(nb)]
            out.append(v)
        return out

    out = random_walks(_edges(pairs), length=4).take_all()
    walks: dict[int, dict[int, int]] = {}
    for r in out:
        walks.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
    assert set(walks) == set(adj)
    for wid, w in walks.items():
        got = [w[s] for s in range(5)]
        assert got == replay(wid, 4), wid
        assert all(x >= B for x in got)       # no wrapped negatives


def test_empty_graph_typed(ray_session):
    out = random_walks(_edges([]), length=3)
    assert out.count() == 0
    assert sorted(out.schema().names) == ["node", "step", "walk_id"]
