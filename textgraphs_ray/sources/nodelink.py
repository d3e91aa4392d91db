"""Node-link JSON dump/load (SURVEY.md S3/S5).

The reference serializes its lemma graph to node-link JSON
(``/root/reference/textgraphs/graph.py:236-296``) and reloads it
(``graph.py:299-391``) — its only resume path.  The engine's dump is a
deterministic, order-free equivalent: nodes sorted by key, edges by
(src, dst, rel, kind), node references by key (content identity) rather
than positional index (SURVEY H4: insertion-order ids don't survive
distributed execution).

Round-trip law (tests/test_roundtrip.py, reference
``tests/test_load.py:23-66``): dump → load → dump is byte-identical.
"""

from __future__ import annotations

import json

import pyarrow as pa


def dump_node_link(nodes: pa.Table, edges: pa.Table) -> str:
    """nodes/edges tables → canonical node-link JSON string."""
    ncols = {c: nodes.column(c).to_pylist() for c in
             ("key", "text", "pos", "kind", "label", "length", "count",
              "sub_obj", "neighbors", "weight") if c in nodes.column_names}
    n = nodes.num_rows
    node_objs = sorted(
        ({k: v[i] for k, v in ncols.items()} for i in range(n)),
        key=lambda d: d["key"])
    ecols = {c: edges.column(c).to_pylist() for c in
             ("src_key", "dst_key", "kind", "rel", "prob", "count")
             if c in edges.column_names}
    m = edges.num_rows
    edge_objs = sorted(
        ({k: v[i] for k, v in ecols.items()} for i in range(m)),
        key=lambda d: (d["src_key"], d["dst_key"], d.get("rel", ""),
                       d.get("kind", "")))
    return json.dumps({"nodes": node_objs, "edges": edge_objs},
                      sort_keys=True, ensure_ascii=False)


def load_node_link(dumped: str) -> tuple[pa.Table, pa.Table]:
    """Canonical node-link JSON → (nodes, edges) Arrow tables."""
    dat = json.loads(dumped)
    nodes = pa.Table.from_pylist(dat["nodes"]) if dat["nodes"] else pa.table({})
    edges = pa.Table.from_pylist(dat["edges"]) if dat["edges"] else pa.table({})
    return nodes, edges
