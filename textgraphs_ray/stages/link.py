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


class SpotlightClient:
    """DBPedia Spotlight ``/annotate`` client (stdlib urllib — no extra
    dependency), the PRODUCTION kernel behind :class:`EntityLinker`
    when an endpoint is reachable (reference ``kg.py:851-983``).

    ``opener`` is injectable so the request/parse path is unit-testable
    without network (this sandbox has none)."""

    def __init__(self, endpoint: str, *, confidence: float = 0.5,
                 timeout: float = 5.0, opener=None) -> None:
        self.endpoint = endpoint.rstrip("/")
        self.confidence = confidence
        self.timeout = timeout
        self._opener = opener
        self.n_requests = 0

    def annotate(self, text: str) -> list[dict]:
        import json as _json
        import urllib.parse
        import urllib.request

        url = (self.endpoint + "/annotate?" + urllib.parse.urlencode(
            {"text": text, "confidence": self.confidence}))
        req = urllib.request.Request(
            url, headers={"Accept": "application/json"})
        open_fn = self._opener or (
            lambda r: urllib.request.urlopen(r, timeout=self.timeout))
        self.n_requests += 1
        with open_fn(req) as resp:
            dat = _json.loads(resp.read().decode("utf-8"))
        return [{"iri": r.get("@URI", ""),
                 "surface": r.get("@surfaceForm", ""),
                 "similarity": float(r.get("@similarityScore", 0.0)),
                 "support": int(r.get("@support", 0))}
                for r in (dat.get("Resources") or [])]


class KGSearchClient:
    """DBPedia Lookup ``/api/search`` fallback client (reference
    ``dbpedia_search_entity``, kg.py:641-735): first hit's resource,
    ``<B>``-dehighlighted label + redirect aliases, acceptance
    probability = best Jaro-Winkler of the query against label/aliases
    (the reference's ``_match_aliases`` with ``min_alias`` floor).
    ``opener`` injectable for network-free tests."""

    def __init__(self, endpoint: str, *, lang: str = "en",
                 timeout: float = 5.0, opener=None) -> None:
        self.endpoint = endpoint
        self.lang = lang
        self.timeout = timeout
        self._opener = opener
        self.n_requests = 0

    @staticmethod
    def _strip_md(s: str) -> str:
        return s.replace("<B>", "").replace("</B>", "")

    def search(self, query: str) -> dict | None:
        import json as _json
        import urllib.parse
        import urllib.request

        from ..functions.strsim import jaro_winkler

        url = (self.endpoint + "?" + urllib.parse.urlencode(
            {"format": "json", "language": self.lang, "query": query}))
        req = urllib.request.Request(
            url, headers={"Accept": "application/json"})
        open_fn = self._opener or (
            lambda r: urllib.request.urlopen(r, timeout=self.timeout))
        self.n_requests += 1
        with open_fn(req) as resp:
            dat = _json.loads(resp.read().decode("utf-8"))
        docs = dat.get("docs") or []
        if not docs:
            return None
        hit = docs[0]
        label = self._strip_md((hit.get("label") or [""])[0])
        aliases = [self._strip_md(a)
                   for a in (hit.get("redirectlabel") or [])]
        q = query.lower()
        prob = max((jaro_winkler(q, c.lower())
                    for c in [label] + aliases if c), default=0.0)
        return {"iri": (hit.get("resource") or [""])[0],
                "label": label, "prob": prob}


class EntityLinker:
    """Actor-pool stage over distinct ent nodes: emits link rows.

    Output columns: (key, iri, wd_iri, rel, prob, label).

    ``spotlight`` / ``kg_search``: optional real HTTP kernels — the
    Spotlight pass first, the DBPedia Lookup fallback for surfaces
    Spotlight misses (exactly the reference's two-pass linking,
    doc.py:330-368); without endpoints (this sandbox) the
    deterministic local function stands in.  Either way the per-actor
    memo means one lookup per DISTINCT surface per actor (T5), and the
    input is the distinct node table, so remote traffic is O(unique
    surfaces), never O(corpus rows)."""

    def __init__(self, *, min_similarity: float = kg.MIN_SIMILARITY,
                 min_alias: float = 0.8,
                 spotlight: "SpotlightClient | None" = None,
                 kg_search: "KGSearchClient | None" = None) -> None:
        self.min_similarity = min_similarity
        self.min_alias = min_alias
        self.spotlight = spotlight
        self.kg_search = kg_search
        self.cache: dict[str, tuple[str, str]] = {}  # per-actor memo (T5)

    def _resolve(self, surface: str) -> tuple[str, str]:
        hit = self.cache.get(surface)
        if hit is None:
            canon = " ".join(w.capitalize() for w in surface.split())
            if self.spotlight is None and self.kg_search is None:
                hit = (kg.link_iri(canon), kg.wikidata_iri(canon))
            else:
                hit = ("", "")
                if self.spotlight is not None:
                    hits = [h for h in self.spotlight.annotate(canon)
                            if h["similarity"] >= self.min_similarity]
                    if hits:
                        best = max(hits, key=lambda h: h["similarity"])
                        hit = (best["iri"], kg.wikidata_iri(canon))
                if not hit[0] and self.kg_search is not None:
                    # KG-search fallback (doc.py:330-368 second pass)
                    found = self.kg_search.search(canon)
                    if found and found["prob"] > self.min_alias:
                        hit = (found["iri"], kg.wikidata_iri(canon))
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
                if not iri:  # below-threshold Spotlight miss: unlinked
                    continue
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
