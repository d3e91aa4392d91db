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


def test_empty_graph_typed(ray_session):
    out = random_walks(_edges([]), length=3)
    assert out.count() == 0
    assert sorted(out.schema().names) == ["node", "step", "walk_id"]
