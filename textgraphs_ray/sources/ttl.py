"""Bootstrap TTL loader (SURVEY.md S4).

The reference parses an RDF Turtle bootstrap with ``rdflib`` and seeds
nodes plus ``skos:broader`` synonym edges and ``rdf:type`` class links
(``/root/reference/textgraphs/doc.py:1103-1212``; example TTL in
``docs/ex2_0.md:68-80``).  ``rdflib`` is not in this container, so this
is a minimal deterministic Turtle subset parser covering the bootstrap
grammar the reference consumes: ``@prefix`` declarations, ``a`` /
prefixed-name predicates, ``<relative-iri>`` subjects/objects,
``"literal"@lang`` objects, ``;`` continuation and ``.`` termination.

The parsed triples become small driver-side Arrow tables unioned into
the engine's node/edge streams before transitive closure — a broadcast
union, not a shuffle (bootstraps are tiny by construction).
"""

from __future__ import annotations

import re

import pyarrow as pa

SKOS_BROADER = "skos:broader"
SKOS_PREFLABEL = "skos:prefLabel"
SKOS_DEFINITION = "skos:definition"

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<comment>\#[^\n]*) |
        (?P<directive>@[A-Za-z]+) |
        (?P<iri><[^>]*>) |
        (?P<literal>"(?:[^"\\]|\\.)*"(?:@\w+)?) |
        (?P<punct>[;.,]) |
        (?P<pname>[A-Za-z_][\w\-]*:[\w\-./#]*|a\b)
    )""",
    re.VERBOSE,
)


def _tokens(ttl: str):
    pos = 0
    while pos < len(ttl):
        m = _TOKEN.match(ttl, pos)
        if m is None:
            pos += 1
            continue
        pos = m.end()
        if m.lastgroup != "comment":
            yield m.group(m.lastgroup)


def parse_ttl(ttl: str) -> list[tuple[str, str, str]]:
    """Return (subject, predicate, object) triples with prefixed names
    left compact and ``<...>`` brackets stripped."""
    triples: list[tuple[str, str, str]] = []
    prefixes: dict[str, str] = {}
    toks = list(_tokens(ttl))
    i = 0

    def clean(t: str) -> str:
        if t.startswith("<") and t.endswith(">"):
            return t[1:-1]
        if t.startswith('"'):
            body = t.rsplit("@", 1)[0] if re.search(r"@\w+$", t) else t
            return body.strip('"')
        return t

    while i < len(toks):
        t = toks[i]
        if t == "@prefix" or t.lower() == "@prefix":
            prefixes[toks[i + 1].rstrip(":")] = clean(toks[i + 2])
            i += 4  # prefix, name, iri, '.'
            continue
        # subject
        subj = clean(t)
        i += 1
        while i < len(toks):
            pred = toks[i]
            pred = "rdf:type" if pred == "a" else pred
            obj = clean(toks[i + 1])
            triples.append((subj, pred, obj))
            i += 2
            if i < len(toks) and toks[i] == ";":
                i += 1
                continue
            if i < len(toks) and toks[i] == ".":
                i += 1
            break
    return triples


def _entity_key(iri: str) -> str:
    """``<entity/werner_PROPN_herzog_PROPN>`` → lemma key
    ``werner.PROPN.herzog.PROPN`` (reference doc.py:1085-1100
    IRI ↔ lemma-key round trip)."""
    slug = iri.split("/", 1)[1] if iri.startswith("entity/") else iri
    return slug.replace("_", ".")


def bootstrap_tables(ttl: str) -> tuple[pa.Table, pa.Table]:
    """TTL → (nodes, edges) Arrow tables in engine schemas.

    ``skos:broader`` → ``syn`` edges (closure input, doc.py:1197-1201);
    ``rdf:type`` on entity subjects → ``iri`` edges.
    """
    triples = parse_ttl(ttl)
    labels: dict[str, str] = {}
    for s, p, o in triples:
        if p == SKOS_PREFLABEL:
            labels[s] = o

    node_keys: list[str] = []
    node_texts: list[str] = []
    e_src: list[str] = []
    e_dst: list[str] = []
    e_kind: list[str] = []
    e_rel: list[str] = []

    for s, p, o in triples:
        if p in (SKOS_PREFLABEL, SKOS_DEFINITION):
            continue
        s_key = _entity_key(s) if s.startswith("entity/") else s
        o_key = _entity_key(o) if o.startswith("entity/") else o
        if s_key not in node_keys:
            node_keys.append(s_key)
            node_texts.append(labels.get(s, s_key))
        # objects of synonym edges are closure participants too —
        # seed them even when they never appear as subjects
        if p == SKOS_BROADER and o_key not in node_keys:
            node_keys.append(o_key)
            node_texts.append(labels.get(o, o_key))
        if p == SKOS_BROADER:
            e_src.append(s_key); e_dst.append(o_key)
            e_kind.append("syn"); e_rel.append(SKOS_BROADER)
        elif p == "rdf:type":
            e_src.append(s_key); e_dst.append(o_key)
            e_kind.append("iri"); e_rel.append("rdf:type")

    nodes = pa.table({
        "key": pa.array(node_keys, pa.string()),
        "text": pa.array(node_texts, pa.string()),
    })
    edges = pa.table({
        "src_key": pa.array(e_src, pa.string()),
        "dst_key": pa.array(e_dst, pa.string()),
        "kind": pa.array(e_kind, pa.string()),
        "rel": pa.array(e_rel, pa.string()),
        "prob": pa.array([1.0] * len(e_src), pa.float64()),
    })
    return nodes, edges
