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
