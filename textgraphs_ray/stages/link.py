"""Deterministic entity linking + secondary equivalence edges
(SURVEY.md J4-J7, T5).

The reference links mentions through DBPedia Spotlight / Search and
Wikidata HTTP APIs with per-process dict caches
(``/root/reference/textgraphs/kg.py:306-367, 851-983, 1068-1142``;
caches kg.py:213-214).  This sandbox has no network, so linking is a
deterministic local function of the surface form — but the distributed
shape is the production one (SURVEY.md §4 "caching"):

1. operate on DISTINCT keys only (the node table is already distinct —
   O(unique keys) "lookups" instead of O(rows));
2. emit ``links`` rows + IRI nodes + ``rdf:type``/``owl:sameAs`` edges;
3. unlinked LEM nodes get ``owl:Thing`` (reference doc.py:558-560).

The ``owl:sameAs`` edges (DBPedia ↔ Wikidata pseudo-QIDs, reference
kg.py:1126-1137) are part of the transitive-closure input, exactly as
SURVEY.md §1.1 prescribes.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data

from ..functions import kg


class EntityLinker:
    """Actor-pool stage over distinct ent nodes: emits link rows.

    Output columns: (key, iri, wd_iri, rel, prob, label).
    """

    def __init__(self, *, min_similarity: float = kg.MIN_SIMILARITY) -> None:
        self.min_similarity = min_similarity
        self.cache: dict[str, tuple[str, str]] = {}  # per-actor memo (T5)

    def _resolve(self, surface: str) -> tuple[str, str]:
        hit = self.cache.get(surface)
        if hit is None:
            canon = " ".join(w.capitalize() for w in surface.split())
            hit = (kg.link_iri(canon), kg.wikidata_iri(canon))
            self.cache[surface] = hit
        return hit

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column("key").to_pylist()
        texts = batch.column("text").to_pylist()
        kinds = batch.column("kind").to_pylist()
        out_key, out_iri, out_wd, out_rel, out_prob, out_label = [], [], [], [], [], []
        for k, t, kd in zip(keys, texts, kinds):
            if kd == "ent" and t:
                iri, wd = self._resolve(t.lower())
                out_key.append(k); out_iri.append(iri); out_wd.append(wd)
                out_rel.append("dbpedia"); out_prob.append(1.0)
                out_label.append(t)
            elif kd == "lem":
                # unlinked lemma nodes labeled owl:Thing (doc.py:558-560)
                out_key.append(k); out_iri.append(kg.OWL_THING); out_wd.append("")
                out_rel.append("owl"); out_prob.append(1.0)
                out_label.append(t)
        return pa.table({
            "key": pa.array(out_key, pa.string()),
            "iri": pa.array(out_iri, pa.string()),
            "wd_iri": pa.array(out_wd, pa.string()),
            "rel": pa.array(out_rel, pa.string()),
            "prob": pa.array(out_prob, pa.float64()),
            "label": pa.array(out_label, pa.string()),
        })


def link_entities(nodes_ds: "ray.data.Dataset", *,
                  concurrency=(1, 4)) -> "ray.data.Dataset":
    """nodes(key, text, kind) → links table via the linker actor pool."""
    return nodes_ds.map_batches(
        EntityLinker, batch_format="pyarrow", concurrency=concurrency)


def sameas_edges(links_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """links → owl:sameAs equivalence edge rows (kg.py:1126-1137):
    node key ↔ DBPedia IRI ↔ Wikidata IRI, closure input."""

    def to_edges(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df[(df["rel"] == "dbpedia") & (df["wd_iri"] != "")]
        return pd.DataFrame({
            "key_a": pd.concat([df["key"], df["iri"]], ignore_index=True),
            "key_b": pd.concat([df["iri"], df["wd_iri"]], ignore_index=True),
            "score": 1.0,
            "method": "sameAs",
        })

    return links_ds.map_batches(to_edges, batch_format="pyarrow")
