"""Complete analysis pipeline — the engine's equivalent of the
reference demo lifecycle (``/root/reference/textgraphs/demo.py:43-220``:
configure → parse → collect → link → infer → graph → rank → emit),
composed from the stage library:

    documents ─┬─ ExtractSpans ──► spans ──► nodes (J1 upsert)
               ├─ extract_raw_edges ──► edges (J2 dedup)
               ├─ RelationScorer ──► INF edges
               └─ ER chain ──► clusters
    nodes ── EntityLinker ──► links + sameAs edges (closure input)
    nodes+edges+clusters ── per-cluster TextRank ──► ranked phrases

Every arrow is a Dataset transform; only small reused intermediates
materialize.  This is the "switch from the reference" entry point: one
call returns every table the reference can produce.
"""

from __future__ import annotations

import pyarrow as pa

import ray
import ray.data

from ..stages.cluster import propagate_labels
from ..stages.graph import (build_edges, build_nodes, extract_raw_edges,
                            iri_nodes_from_edges)
from ..stages.link import link_entities, sameas_edges
from ..stages.relations import infer_relations
from .er import extract_spans, mentions_from_spans
from ..stages.blocking import candidate_pairs
from ..stages.scoring import dedup_matches, score_pairs


def analyze(docs_ds: "ray.data.Dataset", *,
            assets: pa.Table | None = None,
            infer_rels: bool = True,
            link: bool = True,
            num_partitions: int = 16,
            concurrency=None) -> dict:
    """Run the full lifecycle; returns a dict of result Datasets:
    spans, nodes, edges, links, match_edges, clusters, inf_edges."""
    spans = extract_spans(docs_ds, concurrency=concurrency)
    nodes = build_nodes(spans).materialize()

    raw_edges = docs_ds.map_batches(extract_raw_edges,
                                    batch_format="pyarrow")
    edges = build_edges(raw_edges)

    out: dict = {"spans": spans, "nodes": nodes, "edges": edges}

    if infer_rels:
        out["inf_edges"] = infer_relations(docs_ds,
                                           concurrency=concurrency or (1, 4))

    assets_ref = ray.put(assets) if assets is not None else None
    mentions = mentions_from_spans(spans, assets_ref).materialize()
    pairs = candidate_pairs(mentions, concurrency=concurrency)
    matches = dedup_matches(
        score_pairs(pairs, concurrency=concurrency)).materialize()

    closure_edges = matches
    if link:
        links = link_entities(nodes, concurrency=concurrency or (1, 4))
        out["links"] = links
        # owl:sameAs equivalences join the closure input (SURVEY J7)
        closure_edges = matches.union(
            sameas_edges(links).map_batches(
                lambda t: t.select(["key_a", "key_b", "score", "method"]),
                batch_format="pyarrow"))

    out["match_edges"] = matches
    out["clusters"] = propagate_labels(
        mentions.union(
            # linked IRIs participate in closure as nodes too
            out["links"].map_batches(
                lambda t: pa.table({"key": t.column("iri")}),
                batch_format="pyarrow").union(
                out["links"].map_batches(
                    lambda t: pa.table({"key": t.column("wd_iri")}),
                    batch_format="pyarrow")).map_batches(
                lambda t: t.filter(
                    pa.compute.not_equal(t.column("key"), "")),
                batch_format="pyarrow")
            if link else ray.data.from_arrow(
                pa.table({"key": pa.array([], pa.string())})),
        ).map_batches(
            lambda t: pa.table({"key": t.column("key")}),
            batch_format="pyarrow"),
        closure_edges, num_partitions=num_partitions)
    return out
