"""Reference-compatible façade (drop-in API parity layer).

Users of DerwenAI/textgraphs drive a class-based, per-document API:

    tg = textgraphs.TextGraphs(factory=textgraphs.PipelineFactory())
    pipe = tg.create_pipeline(text)
    tg.collect_graph_elements(pipe)
    tg.perform_entity_linking(pipe)
    tg.construct_lemma_graph()
    tg.calc_phrase_ranks()
    df = tg.get_phrases_as_df()

(reference ``doc.py:383-959``, ``pipe.py:216-511``, demo ``demo.py``).
This module reproduces that surface over the Ray Data stages so
existing reference call sites run unchanged; each method mirrors one
lifecycle step from SURVEY.md §3.  The façade is for interactive /
single-document use — corpora should use ``pipelines/er.py`` and
``pipelines/full.py`` directly (the façade materializes to pandas,
which is exactly what the reference's in-memory engine does).

Ray Data auto-initializes a local session on first use; the façade
never calls ``ray.init`` itself (driver-owned sessions pass through).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data as rd


class PipelineFactory:
    """Configuration holder (reference ``pipe.py:440-511``): the spaCy
    model names become no-ops here — the deterministic NLP stand-in has
    no models to load — but the constructor signature is preserved."""

    def __init__(self, spacy_model: str = "en_core_web_sm",
                 ner=None, aux=None, **kwargs) -> None:
        self.spacy_model = spacy_model
        self.ner = ner
        self.aux = aux
        self.kwargs = kwargs

    def create_pipeline(self, text: str) -> "Pipeline":
        return Pipeline(text)


class Pipeline:
    """One document's parse state (reference ``pipe.py:216-270``)."""

    def __init__(self, text: str) -> None:
        self.text = text.strip()


class TextGraphs:
    """Reference lifecycle façade over the Ray stages
    (``doc.py:383-439`` construction)."""

    def __init__(self, factory: PipelineFactory | None = None) -> None:
        self.factory = factory or PipelineFactory()
        self._texts: list[str] = []
        self._docs_ds = None
        self._spans = None
        self._nodes = None
        self._edges = None
        self._links = None
        self._phrases: pd.DataFrame | None = None
        self._bootstrap_ttl: str | None = None

    # -- lifecycle ------------------------------------------------------

    def create_pipeline(self, text: str) -> Pipeline:
        return self.factory.create_pipeline(text)

    def collect_graph_elements(self, pipe: Pipeline, *,
                               debug: bool = False) -> None:
        """Accumulate one document's spans into the graph tables
        (reference ``doc.py:441-538``)."""
        from .pipelines.er import extract_spans, spanify_text
        from .stages.graph import build_nodes

        self._texts.append(pipe.text)
        docs = pa.table({
            "doc_id": pa.array([f"doc-{i:06d}"
                                for i in range(len(self._texts))]),
            "text": pa.array(self._texts),
        })
        self._docs_ds = spanify_text(rd.from_arrow(docs)).materialize()
        self._spans = extract_spans(self._docs_ds).materialize()
        self._nodes = build_nodes(self._spans).materialize()
        self._edges = None  # invalidated until construct_lemma_graph
        self._phrases = None

    def perform_entity_linking(self, pipe: Pipeline | None = None, *,
                               debug: bool = False) -> None:
        """Deterministic local linking (reference ``kg.py:851-1142``
        is network-bound; SURVEY J4-J7)."""
        from .stages.link import link_entities

        if self._nodes is None:
            raise RuntimeError("collect_graph_elements first")
        self._links = link_entities(self._nodes).materialize()

    def infer_relations(self, pipe: Pipeline | None = None, *,
                        debug: bool = False) -> pd.DataFrame:
        """Relation inference over collected documents (reference
        ``rel.py``; SURVEY T3/T4, M11)."""
        from .stages.relations import infer_relations as _infer

        if self._docs_ds is None:
            raise RuntimeError("collect_graph_elements first")
        return _infer(self._docs_ds).to_pandas()

    def construct_lemma_graph(self, *, debug: bool = False) -> None:
        """Dedup edge construction (reference ``doc.py:541-560``); the
        IRI class nodes referenced by rdf:type edges join the node
        table, as the reference's ``_make_class_link`` dst nodes do
        (doc.py:269-288)."""
        from .stages.graph import (build_edges, extract_raw_edges,
                                   iri_nodes_from_edges)

        if self._docs_ds is None:
            raise RuntimeError("collect_graph_elements first")
        raw = self._docs_ds.map_batches(extract_raw_edges,
                                        batch_format="pyarrow")
        self._edges = build_edges(raw).materialize()
        if self._nodes is not None:
            self._nodes = self._nodes.union(
                iri_nodes_from_edges(self._edges)).materialize()

    def calc_phrase_ranks(self, *, pr_alpha: float = 0.85,
                          debug: bool = False) -> None:
        """Per-partition TextRank + restack (reference
        ``doc.py:796-932``; SURVEY A4/A5)."""
        from .pipelines.phrases import ranked_phrases

        if self._spans is None:
            raise RuntimeError("collect_graph_elements first")
        self._phrases = ranked_phrases(self._docs_ds,
                                       self._spans).to_pandas()

    # -- accessors / exports -------------------------------------------

    def get_phrases_as_df(self) -> pd.DataFrame:
        """Ranked phrases (reference ``doc.py:973-984``)."""
        if self._phrases is None:
            raise RuntimeError("calc_phrase_ranks first")
        return self._phrases

    def export_rdf(self, *, lang: str = "en") -> str:
        """N-Triples export (reference ``doc.py:990-1082``)."""
        from .sources.exports import export_rdf as _rdf

        self._require_graph()
        lines = _rdf(self._nodes, self._edges, lang=lang).to_pandas()
        return "\n".join(lines["triple"])

    def export_kuzu(self, out_dir: str) -> None:
        """nodes/edges CSV export (reference ``doc.py:1215-1353``)."""
        from .sources.exports import export_kuzu_csv

        self._require_graph()
        export_kuzu_csv(self._nodes, self._edges, out_dir)

    def dump_lemma_graph(self, *, fmt: str = "reference") -> str:
        """Node-link JSON (reference ``graph.py:236-296``).

        ``fmt="reference"`` (default, matching the reference's output
        shape byte-for-byte in structure: positional ids, NetworkX
        property names) or ``fmt="canonical"`` (the engine's key-keyed
        deterministic dump)."""
        from .sources.nodelink import (dump_node_link,
                                       dump_reference_node_link)

        self._require_graph()
        nodes_t = pa.Table.from_pandas(self._nodes.to_pandas(),
                                       preserve_index=False)
        edges_t = pa.Table.from_pandas(self._edges.to_pandas(),
                                       preserve_index=False)
        if fmt == "reference":
            return dump_reference_node_link(nodes_t, edges_t)
        return dump_node_link(nodes_t, edges_t)

    def load_lemma_graph(self, json_str: str, *,
                         debug: bool = False) -> None:
        """Deserialize a node-link dump — the reference's resume path
        (``graph.py:299-391``).  Accepts BOTH the reference's
        positional-index format and the engine's canonical dump."""
        del debug
        from .sources.nodelink import load_node_link

        nodes_t, edges_t = load_node_link(json_str)
        import ray.data as _rd

        self._nodes = _rd.from_arrow(nodes_t).materialize()
        self._edges = _rd.from_arrow(edges_t).materialize()

    def load_bootstrap_ttl(self, ttl: str) -> None:
        """Seed synonym/class edges from Turtle (reference
        ``doc.py:1103-1212``); unioned before closure."""
        self._bootstrap_ttl = ttl

    def resolve_entities(self, **kwargs) -> pd.DataFrame:
        """Cluster assignment over collected documents — the engine's
        flagship chain, exposed on the façade."""
        from .pipelines.er import resolve_entities as _resolve

        if self._docs_ds is None:
            raise RuntimeError("collect_graph_elements first")
        res = _resolve(self._docs_ds, num_partitions=4, **kwargs)
        clusters = res["clusters"]
        if self._bootstrap_ttl:
            from .sources.ttl import bootstrap_tables
            from .stages.cluster import propagate_labels

            nodes_t, edges_t = bootstrap_tables(self._bootstrap_ttl)
            nodes = res["mentions"].map_batches(
                lambda t: pa.table({"key": t.column("key")}),
                batch_format="pyarrow").union(
                rd.from_arrow(pa.table({"key": nodes_t.column("key")})))
            edges = res["match_edges"].map_batches(
                lambda t: pa.table({"key_a": t.column("key_a"),
                                    "key_b": t.column("key_b")}),
                batch_format="pyarrow").union(
                rd.from_arrow(pa.table({
                    "key_a": edges_t.column("src_key"),
                    "key_b": edges_t.column("dst_key")})))
            clusters = propagate_labels(nodes, edges, num_partitions=4)
        return clusters.to_pandas()

    def _require_graph(self) -> None:
        if self._nodes is None:
            raise RuntimeError("collect_graph_elements first")
        if self._edges is None:
            raise RuntimeError("construct_lemma_graph first")


class GraphOfRelations:
    """Reference ``gor.py`` façade: InGram loader + affinity transform
    (``gor.py:125-451``; SURVEY S2, A10-A13)."""

    def __init__(self, source=None) -> None:
        self.source = source
        self._edges: pa.Table | None = None
        self._rels: list[str] = []

    def load_ingram(self, json_path: str, *, debug: bool = False) -> None:
        from .pipelines.gor import load_ingram as _load

        self._edges, self._rels, _ = _load(str(json_path))

    def seeds(self, *, debug: bool = False) -> None:
        """Half-edge seeding happens inside the distributed transform;
        kept for call-site compatibility."""

    def construct_gor(self, *, debug: bool = False) -> None:
        """Pair/arc construction happens inside the distributed
        transform; kept for call-site compatibility."""

    def get_affinity_scores(self, *, num_perms: int = 0,
                            debug: bool = False) -> pd.DataFrame:
        from .pipelines.gor import affinity_scores

        if self._edges is None:
            raise RuntimeError("load_ingram first")
        return affinity_scores(rd.from_arrow(self._edges), self._rels)


class KGWikiMedia:
    """Reference ``kg.py`` façade: the deterministic local stand-ins
    for the DBPedia/Wikidata helpers (``kg.py:237-303, 501-550``)."""

    def remap_ner(self, label):
        from .functions.kg import remap_ner as _remap

        return _remap(label)

    def normalize_prefix(self, iri: str) -> str:
        from .functions.kg import normalize_prefix as _norm

        return _norm(iri)

    def resolve_rel_iri(self, rel: str, *, lang: str = "en",
                        debug: bool = False) -> str:
        from .functions.kg import resolve_rel_iri as _resolve

        return _resolve(rel)


from dataclasses import dataclass  # noqa: E402


@dataclass
class NodeStyle:
    """PyVis node styling (reference ``vis.py:31-37``)."""
    label: str
    shape: str
    color: str


NODE_STYLES = [
    NodeStyle(label="dep", shape="star", color="hsla(72, 19%, 90%, 0.4)"),
    NodeStyle(label="lem", shape="square", color="hsla(306, 45%, 57%, 0.95)"),
    NodeStyle(label="ent", shape="circle", color="hsla(65, 46%, 58%, 0.95)"),
    NodeStyle(label="chu", shape="triangle", color="hsla(72, 19%, 90%, 0.9)"),
    NodeStyle(label="iri", shape="diamond", color="hsla(55, 17%, 49%, 0.95)"),
    NodeStyle(label="media", shape="box", color="hsla(200, 40%, 60%, 0.9)"),
]


class RenderPyVis:
    """Lemma-graph rendering (reference ``vis.py:70-204``): produces
    the styled node/edge tables; the actual PyVis network is built only
    when the optional ``pyvis`` package is importable (absent in this
    container — the data contract is the tested surface)."""

    def __init__(self, tg: TextGraphs) -> None:
        self.tg = tg

    def styled_nodes(self) -> pd.DataFrame:
        self.tg._require_graph()
        styles = {s.label: s for s in NODE_STYLES}
        df = self.tg._nodes.to_pandas()
        df["shape"] = [styles[k].shape if k in styles else "dot"
                       for k in df["kind"]]
        df["color"] = [styles[k].color if k in styles else "#999"
                       for k in df["kind"]]
        # node size follows rank weight when phrase ranks were computed
        if self.tg._phrases is not None:
            w = dict(zip(self.tg._phrases["key"],
                         self.tg._phrases["weight"]))
            df["size"] = [10 + 60 * float(w.get(k, 0.0))
                          for k in df["key"]]
        else:
            df["size"] = 10.0
        return df

    def styled_edges(self) -> pd.DataFrame:
        self.tg._require_graph()
        return self.tg._edges.to_pandas()

    def render_lemma_graph(self, html_path: str | None = None):
        """Render the lemma graph (reference ``vis.py:94-164``): build
        the styled node/edge tables and, when ``html_path`` is given,
        write an HTML rendering — the real pyvis network when pyvis is
        importable, else the engine's self-contained SVG emitter
        (``stages/render.py``).  Always returns (nodes_df, edges_df)."""
        nodes, edges = self.styled_nodes(), self.styled_edges()
        if html_path:
            from .stages.render import write_lemma_graph_html

            write_lemma_graph_html(nodes, edges, html_path)
        return nodes, edges
