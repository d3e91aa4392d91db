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


def dump_reference_node_link(nodes: pa.Table, edges: pa.Table) -> str:
    """nodes/edges tables → node-link JSON in the REFERENCE'S shape
    (``dump_lemma_graph``, graph.py:236-296): NetworkX property names
    (``lemma``/``name``/``subobj``/``hood``/``title``), positional
    ``source``/``target`` ints, ``sort_keys`` + 2-space indent — so a
    graph built here can be loaded by the reference's
    ``load_lemma_graph`` unchanged.  Node order (and therefore the
    positional ids) is key-sorted: deterministic under any execution
    order."""
    cols = {c: nodes.column(c).to_pylist() if c in nodes.column_names
            else [None] * nodes.num_rows
            for c in ("key", "text", "pos", "kind", "label", "length",
                      "count", "sub_obj", "neighbors", "weight", "loc")}
    if "loc" not in nodes.column_names and "locs" in nodes.column_names:
        # engine-native tables carry locs as list<struct>; the reference
        # serializes loc as the printed repr of [sent_id, token_id] pairs
        cols["loc"] = [str([[d["sent_id"], d["token_id"]] for d in v])
                       for v in nodes.column("locs").to_pylist()]
    order = sorted(range(nodes.num_rows), key=lambda i: cols["key"][i])
    index_of = {cols["key"][i]: pos for pos, i in enumerate(order)}
    node_objs = []
    for i in order:
        kind = cols["kind"][i] or ""
        label = cols["label"][i] or ""
        if kind == "iri":
            iri = cols["key"][i]
        elif label.startswith("http"):
            iri = label
        else:
            iri = None
        loc = cols["loc"][i]
        node_objs.append({
            "anno": False,
            "count": int(cols["count"][i] or 0),
            "hood": int(cols["neighbors"][i] or 0),
            "iri": iri,
            "kind": kind,
            "label": label,
            "lemma": cols["key"][i],
            "length": int(cols["length"][i] or 1),
            "loc": loc if isinstance(loc, str) else str(loc or []),
            "name": cols["text"][i] or "",
            "pos": cols["pos"][i] or "",
            "subobj": bool(cols["sub_obj"][i]),
            "weight": float(cols["weight"][i] or 0.0),
        })
    ecols = {c: edges.column(c).to_pylist() if c in edges.column_names
             else [None] * edges.num_rows
             for c in ("src_key", "dst_key", "kind", "rel", "prob",
                       "count")}
    link_objs = sorted((
        {
            "count": int(ecols["count"][i] or 1),
            "kind": ecols["kind"][i] or "",
            "lemma": (f"{ecols['src_key'][i]}.{ecols['dst_key'][i]}."
                      f"{ecols['rel'][i]}.{ecols['kind'][i]}"),
            "prob": float(ecols["prob"][i] if ecols["prob"][i] is not None
                          else 1.0),
            "source": index_of[ecols["src_key"][i]],
            "target": index_of[ecols["dst_key"][i]],
            "title": ecols["rel"][i] or "",
            "weight": float(ecols["count"][i] or 1),
        } for i in range(edges.num_rows)),
        key=lambda d: (d["source"], d["target"], d["title"], d["kind"]))
    node_link = {"directed": True, "multigraph": True,
                 "nodes": node_objs, "links": link_objs, "graph": {}}
    return json.dumps(node_link, sort_keys=True, indent=2,
                      separators=(",", ":"))


def load_node_link(dumped: str) -> tuple[pa.Table, pa.Table]:
    """Node-link JSON → (nodes, edges) Arrow tables.

    Accepts BOTH formats:

    - the engine's canonical dump (``{"nodes": [...], "edges": [...]}``
      with by-key edge references), and
    - the reference's ``dump_lemma_graph()`` output
      (``/root/reference/textgraphs/graph.py:236-296``): NetworkX
      node-link shape ``{"directed", "multigraph", "nodes", "links",
      "graph"}`` where edges reference nodes by POSITIONAL index and
      node/edge property names differ (``lemma``/``name``/``subobj``/
      ``hood``/``title``/``source``/``target``) — a user migrating
      saved graphs from the reference loads them unchanged.
    """
    dat = json.loads(dumped)
    if "links" in dat:
        return _load_reference_node_link(dat)
    nodes = pa.Table.from_pylist(dat["nodes"]) if dat["nodes"] else pa.table({})
    edges = pa.Table.from_pylist(dat["edges"]) if dat["edges"] else pa.table({})
    return nodes, edges


def _load_reference_node_link(dat: dict) -> tuple[pa.Table, pa.Table]:
    """Reference positional-index node-link dict → engine tables.

    Mirrors ``load_lemma_graph`` (graph.py:299-391): node key comes
    from ``lemma``; an ENT node with a non-null ``iri`` takes that IRI
    as its label (the re-linking step, graph.py:352-372); edge
    ``source``/``target`` ints index the nodes list in order; ``loc``
    is the printed repr of a list of [sent_id, token_id]-style pairs
    (parsed safely, never ``eval``)."""
    import ast

    raw_nodes = dat.get("nodes") or []
    raw_links = dat.get("links") or []
    keys = [n["lemma"] for n in raw_nodes]
    node_rows = []
    for n in raw_nodes:
        kind = n.get("kind", "")
        label = n.get("label")
        if kind == "ent" and n.get("iri") is not None:
            label = n["iri"]
        loc = n.get("loc", "[]")
        if isinstance(loc, str):
            try:
                loc = ast.literal_eval(loc)
            except (ValueError, SyntaxError):
                loc = []
        node_rows.append({
            "key": n["lemma"],
            "text": n.get("name", ""),
            "pos": n.get("pos", ""),
            "kind": kind,
            "label": label if label is not None else "",
            "length": int(n.get("length", 1)),
            "count": int(n.get("count", 0)),
            "sub_obj": bool(n.get("subobj", False)),
            "neighbors": int(n.get("hood", 0)),
            "weight": float(n.get("weight", 0.0)),
            "loc": json.dumps(loc),
        })
    edge_rows = [{
        "src_key": keys[e["source"]],
        "dst_key": keys[e["target"]],
        "kind": e.get("kind", ""),
        "rel": e.get("title", ""),
        "prob": float(e.get("prob", 1.0)),
        "count": int(e.get("count", 1)),
    } for e in raw_links]
    nodes = (pa.Table.from_pylist(node_rows) if node_rows
             else pa.table({}))
    edges = (pa.Table.from_pylist(edge_rows) if edge_rows
             else pa.table({}))
    return nodes, edges
