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
