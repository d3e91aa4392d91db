"""Round-trip serialization (FIXTURES F2; reference tests/test_load.py).

"See Spot run." → nodes/edges → dump → load → dump must be identical.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from textgraphs_ray.pipelines.er import extract_spans, spanify_text
from textgraphs_ray.sources.nodelink import dump_node_link, load_node_link
from textgraphs_ray.stages.graph import (build_edges, build_nodes,
                                         extract_raw_edges)


def test_round_trip_see_spot_run():
    docs = spanify_text(rd.from_arrow(pa.table({
        "doc_id": ["spot-0"], "text": ["See Spot run."]}))).materialize()
    spans = extract_spans(docs)
    nodes = build_nodes(spans).to_pandas()
    edges = build_edges(docs.map_batches(
        extract_raw_edges, batch_format="pyarrow")).to_pandas()

    nodes_t = pa.Table.from_pandas(nodes, preserve_index=False)
    edges_t = pa.Table.from_pandas(edges, preserve_index=False)

    dump1 = dump_node_link(nodes_t, edges_t)
    n2, e2 = load_node_link(dump1)
    dump2 = dump_node_link(n2, e2)
    assert dump1 == dump2

    # spot is recognized as a PROPN entity; run as VERB
    keys = set(nodes["key"])
    assert "spot.PROPN" in keys
    assert "run.VERB" in keys


def test_load_reference_format():
    """Loading the reference's positional-index node-link dump
    (graph.py:236-391 shape: links/source/target ints, lemma/name/
    subobj/hood/title props, loc as printed repr) yields engine tables,
    and re-dumping canonically round-trips."""
    import json
    import pathlib

    fixture = (pathlib.Path(__file__).parent / "data"
               / "reference_lemma_graph.json").read_text()
    nodes, edges = load_node_link(fixture)

    nd = {r["key"]: r for r in nodes.to_pylist()}
    assert set(nd) == {"see.VERB", "spot.PROPN", "run.VERB", "dbo:Person"}
    # ENT node with a non-null iri takes the IRI as label (the
    # reference's re-linking semantics, graph.py:352-372)
    assert nd["spot.PROPN"]["label"] == "http://dbpedia.org/ontology/Person"
    assert nd["spot.PROPN"]["sub_obj"] is True
    assert nd["see.VERB"]["neighbors"] == 2
    assert json.loads(nd["see.VERB"]["loc"]) == [[0, 0]]

    ed = {(r["src_key"], r["dst_key"]): r for r in edges.to_pylist()}
    # positional source/target ints resolved to node keys
    assert ("spot.PROPN", "see.VERB") in ed
    assert ed[("spot.PROPN", "see.VERB")]["rel"] == "nsubj"
    assert ed[("spot.PROPN", "dbo:Person")]["kind"] == "iri"

    # cross-format round-trip: reference load → canonical dump → load →
    # identical canonical dump
    dump1 = dump_node_link(nodes, edges)
    n2, e2 = load_node_link(dump1)
    assert dump_node_link(n2, e2) == dump1


def test_dump_reference_format_roundtrip():
    """dump_reference_node_link emits the reference's own shape
    (positional links, lemma/name/subobj/hood/title props, repr loc),
    and load(dump_reference(load(fixture))) is a fixpoint."""
    import json
    import pathlib

    from textgraphs_ray.sources.nodelink import dump_reference_node_link

    fixture = (pathlib.Path(__file__).parent / "data"
               / "reference_lemma_graph.json").read_text()
    n1, e1 = load_node_link(fixture)
    dumped = dump_reference_node_link(n1, e1)
    dat = json.loads(dumped)
    assert set(dat) == {"directed", "multigraph", "nodes", "links",
                        "graph"}
    assert all(isinstance(l["source"], int) and isinstance(l["target"],
               int) for l in dat["links"])
    assert {"lemma", "name", "subobj", "hood", "anno", "iri",
            "loc"} <= set(dat["nodes"][0])
    n2, e2 = load_node_link(dumped)
    # fixpoint through the canonical dump
    assert dump_node_link(n2, e2) == dump_node_link(n1, e1)

    # an engine-built graph (locs as list<struct>) also dumps cleanly
    docs = spanify_text(rd.from_arrow(pa.table({
        "doc_id": ["d0"], "text": ["See Spot run."]}))).materialize()
    from textgraphs_ray.stages.graph import iri_nodes_from_edges

    edges_ds = build_edges(docs.map_batches(
        extract_raw_edges, batch_format="pyarrow")).materialize()
    nodes_df = (build_nodes(extract_spans(docs))
                .union(iri_nodes_from_edges(edges_ds)).to_pandas())
    nodes_t = pa.Table.from_pandas(nodes_df, preserve_index=False)
    edges_t = pa.Table.from_pandas(edges_ds.to_pandas(),
                                   preserve_index=False)
    ref_dump = dump_reference_node_link(nodes_t, edges_t)
    dat2 = json.loads(ref_dump)
    assert len(dat2["nodes"]) == nodes_t.num_rows
    assert len(dat2["links"]) == edges_t.num_rows
    # loc strings are the reference's printed [[sent_id, token_id]] form
    assert all(n["loc"].startswith("[") for n in dat2["nodes"])
