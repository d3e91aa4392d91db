"""Export sinks: RDF/N3 triples and KùzuDB-style CSV (SURVEY.md S6/S7).

- :func:`export_rdf` mirrors the reference's ``TextGraphs.export_rdf``
  (``/root/reference/textgraphs/doc.py:990-1082``): ENT/LEM/IRI nodes
  become ``skos:prefLabel`` triples, inferred (INF) edges become
  property triples; IRIs use the namespace-prefix table.  Emitted as a
  Dataset of N-Triples lines so the sink streams
  (``write_text``-shaped), not a driver-side string build.

- :func:`export_kuzu_csv` mirrors ``TextGraphs.export_kuzu``
  (``doc.py:1215-1353``): nodes.csv + edges.csv projections written as
  partitioned CSV directories via ``Dataset.write_csv``.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..functions import kg


def _iri_for(key: str, kind: str) -> str:
    if kind == "iri" or key.startswith("http"):
        return key
    return "https://github.com/DerwenAI/textgraphs/ns/entity/" + \
        key.replace(" ", "_").replace(".", "_")


def export_rdf(nodes_ds: "ray.data.Dataset", edges_ds: "ray.data.Dataset",
               *, lang: str = "en") -> "ray.data.Dataset":
    """nodes/edges → Dataset of N-Triples lines (streamed projection)."""

    def node_triples(t: pa.Table) -> pa.Table:
        lines = []
        for key, kind, text in zip(t.column("key").to_pylist(),
                                   t.column("kind").to_pylist(),
                                   t.column("text").to_pylist()):
            if kind not in ("ent", "lem", "iri"):
                continue
            iri = _iri_for(key, kind)
            label = (text or key).replace('"', '\\"')
            lines.append(
                f'<{iri}> <{kg.NS_PREFIX["rdf"]}type> <{kg.OWL_THING}> .')
            lines.append(
                f'<{iri}> <http://www.w3.org/2004/02/skos/core#prefLabel> '
                f'"{label}"@{lang} .')
        return pa.table({"triple": pa.array(lines, pa.string())})

    def edge_triples(t: pa.Table) -> pa.Table:
        lines = []
        for s, d, kind, rel in zip(t.column("src_key").to_pylist(),
                                   t.column("dst_key").to_pylist(),
                                   t.column("kind").to_pylist(),
                                   t.column("rel").to_pylist()):
            if kind not in ("inf", "iri", "syn"):
                continue
            pred = rel if rel.startswith("http") else \
                "https://github.com/DerwenAI/textgraphs/ns/rel/" + \
                rel.replace(" ", "_")
            lines.append(f'<{_iri_for(s, "")}> <{pred}> <{_iri_for(d, "")}> .')
        return pa.table({"triple": pa.array(lines, pa.string())})

    return (nodes_ds.map_batches(node_triples, batch_format="pyarrow")
            .union(edges_ds.map_batches(edge_triples, batch_format="pyarrow")))


def export_kuzu_csv(nodes_ds: "ray.data.Dataset",
                    edges_ds: "ray.data.Dataset", out_dir: str) -> None:
    """Write nodes.csv/edges.csv projection directories (partitioned,
    resumable layout — never one giant file)."""
    nodes_ds.map_batches(
        lambda t: t.select([c for c in ("key", "text", "pos", "kind",
                                        "label", "count", "weight")
                            if c in t.column_names]),
        batch_format="pyarrow",
    ).write_csv(f"{out_dir}/nodes")
    edges_ds.map_batches(
        lambda t: t.select([c for c in ("src_key", "dst_key", "kind",
                                        "rel", "prob", "count")
                            if c in t.column_names]),
        batch_format="pyarrow",
    ).write_csv(f"{out_dir}/edges")
