"""Node upsert / edge dedup tests (SURVEY.md J1/J2/A1/A2)."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from textgraphs_ray.schema import DOCUMENTS
from textgraphs_ray.stages.graph import (build_edges, build_nodes,
                                         extract_raw_edges,
                                         iri_nodes_from_edges)
from textgraphs_ray.pipelines.er import extract_spans


def _docs(span_lists):
    return pa.Table.from_pydict(
        {"doc_id": [f"d{i}" for i in range(len(span_lists))],
         "spans": span_lists}, schema=DOCUMENTS)


def _span(kind, text, offset, media_ref=""):
    return {"kind": kind, "text": text, "media_ref": media_ref,
            "offset": offset}


def test_node_upsert_counts_and_locs():
    docs = _docs([
        [_span("ent", "Spot", 0), _span("lem", "run", 1)],
        [_span("ent", "Spot", 0), _span("lem", "jump", 1)],
    ])
    spans = extract_spans(rd.from_arrow(docs), batch_size=1)
    nodes = build_nodes(spans).to_pandas().set_index("key")
    spot = nodes.loc["spot.PROPN"]
    assert spot["count"] == 2
    assert spot["kind"] == "ent"
    assert len(spot["locs"]) == 2
    assert {l["doc_id"] for l in spot["locs"]} == {"d0", "d1"}
    # content-derived ids: same key → same id regardless of order
    assert nodes.loc["run.VERB", "node_id"] != spot["node_id"]


def test_edge_dedup_counts():
    docs = _docs([
        [_span("dep", "the", 0), _span("lem", "dog", 1),
         _span("lem", "ran", 2)],
        [_span("dep", "the", 0), _span("lem", "dog", 1),
         _span("lem", "ran", 2)],
    ])
    edges = build_edges(
        rd.from_arrow(docs).map_batches(
            extract_raw_edges, batch_format="pyarrow")).to_pandas()
    # identical docs → every edge has count 2
    assert (edges["count"] == 2).all()
    # no self-loops (reference graph.py:220-221)
    assert (edges["src_key"] != edges["dst_key"]).all()


def test_iri_class_nodes():
    docs = _docs([[_span("ent", "Germany", 0)]])
    edges = build_edges(
        rd.from_arrow(docs).map_batches(
            extract_raw_edges, batch_format="pyarrow"))
    iri = iri_nodes_from_edges(edges).to_pandas()
    assert list(iri["key"]) == ["http://dbpedia.org/ontology/Country"]
    assert list(iri["label"]) == ["country"]
