"""Knowledge-graph mapping tables + deterministic local entity linking.

Reproduces the *semantics* of the reference's ``KGWikiMedia`` wrapper
(``/root/reference/textgraphs/kg.py:48-211``): the OntoTypes4 → IRI
``NER_MAP`` (kg.py:52-143), the namespace-prefix table (kg.py:145-162),
``remap_ner`` (kg.py:237-263) and ``normalize_prefix`` (kg.py:266-303).

The reference links entities through live DBPedia/Wikidata HTTP APIs
(kg.py:479-498, 676-684); this sandbox has no network, so linking is a
deterministic local function: the IRI is the dbr: slug of the
*canonical* surface form, and the secondary Wikidata equivalence
(kg.py:1068-1142 ``owl:sameAs``) is a content-hash pseudo-QID.  The
distributed pattern is the real one: distinct-key pre-resolution then
broadcast join (SURVEY.md T5/J4-J7).
"""

from __future__ import annotations

from urllib.parse import urlparse

# OntoTypes4 NER label → canonical IRI + metadata (facts mirrored from
# reference kg.py:52-143; 18 entries).
NER_MAP: dict[str, dict] = {
    "CARDINAL": {"iri": "http://dbpedia.org/resource/Cardinal_number",
                 "definition": "Numerals that do not fall under another type",
                 "label": "cardinal number"},
    "DATE": {"iri": "http://dbpedia.org/ontology/date",
             "definition": "Absolute or relative dates or periods",
             "label": "date"},
    "EVENT": {"iri": "http://dbpedia.org/ontology/Event",
              "definition": "Named hurricanes, battles, wars, sports events, etc.",
              "label": "event"},
    "FAC": {"iri": "http://dbpedia.org/ontology/Infrastructure",
            "definition": "Buildings, airports, highways, bridges, etc.",
            "label": "infrastructure"},
    "GPE": {"iri": "http://dbpedia.org/ontology/Country",
            "definition": "Countries, cities, states",
            "label": "country"},
    "LANGUAGE": {"iri": "http://dbpedia.org/ontology/Language",
                 "definition": "Any named language",
                 "label": "language"},
    "LAW": {"iri": "http://dbpedia.org/ontology/Law",
            "definition": "Named documents made into laws",
            "label": "law"},
    "LOC": {"iri": "http://dbpedia.org/ontology/Place",
            "definition": "Non-GPE locations, mountain ranges, bodies of water",
            "label": "place"},
    "MONEY": {"iri": "http://dbpedia.org/resource/Money",
              "definition": "Monetary values, including unit",
              "label": "money"},
    "NORP": {"iri": "http://dbpedia.org/ontology/nationality",
             "definition": "Nationalities or religious or political groups",
             "label": "nationality"},
    "ORDINAL": {"iri": "http://dbpedia.org/resource/Ordinal_number",
                "definition": "Ordinal number, i.e., first, second, etc.",
                "label": "ordinal number"},
    "ORG": {"iri": "http://dbpedia.org/ontology/Organisation",
            "definition": "Companies, agencies, institutions, etc.",
            "label": "organization"},
    "PERCENT": {"iri": "http://dbpedia.org/resource/Percentage",
                "definition": "Percentage",
                "label": "percentage"},
    "PERSON": {"iri": "http://dbpedia.org/ontology/Person",
               "definition": "People, including fictional",
               "label": "person"},
    "PRODUCT": {"iri": "http://dbpedia.org/ontology/product",
                "definition": "Vehicles, weapons, foods, etc. (Not services)",
                "label": "product"},
    "QUANTITY": {"iri": "http://dbpedia.org/resource/Quantity",
                 "definition": "Measurements, as of weight or distance",
                 "label": "quantity"},
    "TIME": {"iri": "http://dbpedia.org/ontology/time",
             "definition": "Times smaller than a day",
             "label": "time"},
    "WORK OF ART": {"iri": "http://dbpedia.org/resource/Work_of_art",
                    "definition": "Titles of books, songs, etc.",
                    "label": "work of art"},
}

# RDF namespace prefixes (facts mirrored from reference kg.py:145-162).
NS_PREFIX: dict[str, str] = {
    "dbc": "http://dbpedia.org/resource/Category:",
    "dbt": "http://dbpedia.org/resource/Template:",
    "dbr": "http://dbpedia.org/resource/",
    "yago": "http://dbpedia.org/class/yago/",
    "dbd": "http://dbpedia.org/datatype/",
    "dbo": "http://dbpedia.org/ontology/",
    "dbp": "http://dbpedia.org/property/",
    "units": "http://dbpedia.org/units/",
    "dbpedia-commons": "http://commons.dbpedia.org/resource/",
    "dbpedia-wikicompany": "http://dbpedia.openlinksw.com/wikicompany/",
    "dbpedia-wikidata": "http://wikidata.dbpedia.org/resource/",
    "wd": "http://www.wikidata.org/",
    "wd_ent": "http://www.wikidata.org/entity/",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "schema": "https://schema.org/",
    "owl": "http://www.w3.org/2002/07/owl#",
}

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"
OWL_THING = "http://www.w3.org/2002/07/owl#Thing"
SKOS_BROADER = "http://www.w3.org/2004/02/skos/core#broader"

# Link-accept thresholds (reference defaults.py:13-14,28).
MIN_ALIAS = 0.8
MIN_SIMILARITY = 0.9


def remap_ner(label: str | None) -> str | None:
    """OntoTypes4 label → canonical IRI (reference kg.py:237-263)."""
    if not label:
        return None
    meta = NER_MAP.get(label)
    return meta["iri"] if meta is not None else None


def normalize_prefix(iri: str) -> str:
    """Fully-qualified IRI → ``prefix:slug`` (reference kg.py:266-303).

    Longest-matching namespace path wins (the reference relies on dict
    order with dbc/dbt before dbr; matching longest-path-first is
    order-free and equivalent).
    """
    p = urlparse(iri)
    best: tuple[int, str, str] | None = None
    for prefix, ns in NS_PREFIX.items():
        np_ = urlparse(ns)
        if p.netloc == np_.netloc and p.path.startswith(np_.path):
            cand = (len(np_.path), prefix, np_.path)
            if best is None or cand[0] > best[0]:
                best = cand
    if best is None:
        return iri
    _, prefix, ns_path = best
    if p.fragment:
        return f"{prefix}:{p.fragment}"
    return f"{prefix}:{p.path.replace(ns_path, '', 1)}"


def iri_slug(surface: str) -> str:
    """Surface form → dbr slug (reference doc.py:1013 munging)."""
    return surface.replace(" ", "_").replace(".", "_")


def link_iri(canonical_surface: str) -> str:
    """Deterministic local stand-in for DBPedia lookup: canonical
    surface form → dbr: IRI."""
    return NS_PREFIX["dbr"] + iri_slug(canonical_surface)


# Surface form → Wikidata QID for well-known entities: public
# ``owl:sameAs`` facts (every pair below is published by both DBPedia
# and Wikidata).  This is the same two-tier shape as REL_PROP_CACHE —
# the warm cache the reference accumulates by querying the live
# Wikidata API per entity (kg.py:1068-1142); offline, a pre-resolved
# cache of unambiguous entities is the faithful equivalent.
ENTITY_QID_CACHE: dict[str, str] = {
    # countries
    "germany": "Q183", "france": "Q142", "united states": "Q30",
    "united kingdom": "Q145", "japan": "Q17", "china": "Q148",
    "india": "Q668", "russia": "Q159", "italy": "Q38", "spain": "Q29",
    "canada": "Q16", "australia": "Q408", "brazil": "Q155",
    "austria": "Q40", "switzerland": "Q39", "netherlands": "Q55",
    "sweden": "Q34", "norway": "Q20", "poland": "Q36",
    # cities
    "berlin": "Q64", "paris": "Q90", "london": "Q84",
    "new york city": "Q60", "tokyo": "Q1490", "rome": "Q220",
    "vienna": "Q1741", "munich": "Q1726", "moscow": "Q649",
    "madrid": "Q2807", "amsterdam": "Q727",
    # continents / planet
    "earth": "Q2", "europe": "Q46", "asia": "Q48", "africa": "Q15",
    # people (incl. the reference's own demo subject, Werner Herzog)
    "albert einstein": "Q937", "isaac newton": "Q935",
    "charles darwin": "Q1035", "marie curie": "Q7186",
    "william shakespeare": "Q692", "leonardo da vinci": "Q762",
    "wolfgang amadeus mozart": "Q254", "ludwig van beethoven": "Q255",
    "johann sebastian bach": "Q1339", "barack obama": "Q76",
    "angela merkel": "Q567", "werner herzog": "Q44131",
    # languages
    "english": "Q1860", "german": "Q188", "french": "Q150",
}


def wikidata_iri(canonical_surface: str, *, strict: bool = False) -> str:
    """Surface form → Wikidata entity IRI, two-tier like the
    reference's per-entity API resolution (kg.py:1068-1142):
    a cache hit yields the REAL canonical QID (public sameAs facts,
    ``ENTITY_QID_CACHE``); a miss yields a deterministic content-hash
    pseudo-QID stand-in — or ``""`` under ``strict=True``, matching
    the reference's emit-no-sameAs-edge-on-API-miss behavior
    (``sameas_edges`` drops empty ``wd_iri`` rows)."""
    qid = ENTITY_QID_CACHE.get(canonical_surface.strip().lower())
    if qid is not None:
        return NS_PREFIX["wd_ent"] + qid
    if strict:
        return ""
    import hashlib
    h = int(hashlib.sha1(canonical_surface.encode("utf-8")).hexdigest()[:8], 16)
    # pseudo ids live far above the real QID range (~1.3e8 as of 2025)
    # so a stand-in can never collide with a cached real entity and
    # spuriously merge two clusters through the sameAs closure
    return NS_PREFIX["wd_ent"] + f"Q{2_000_000_000 + h}"


# Relation label → Wikidata property id, for the relation vocabularies
# the reference's RE models emit (OpenNRE `wiki80` / mREBEL are TRAINED
# on Wikidata properties, so the label→P-id pairs below are public
# facts from that dataset/ontology).  This is the warm `iri_cache` the
# reference builds by querying the live Wikidata API per label
# (kg.py:370-438); offline, a pre-resolved cache of the model's OWN
# training vocabulary is the faithful equivalent — labels outside it
# fall back to the reference's literal convention (rel.py:108-110).
REL_PROP_CACHE: dict[str, str] = {
    "place served by transport hub": "P931",
    "mouth of the watercourse": "P403",
    "contains administrative territorial entity": "P150",
    "located in the administrative territorial entity": "P131",
    "head of government": "P6",
    "country of citizenship": "P27",
    "original network": "P449",
    "heritage designation": "P1435",
    "performer": "P175",
    "participant of": "P1344",
    "position held": "P39",
    "has part": "P527",
    "part of": "P361",
    "location of formation": "P740",
    "located on terrain feature": "P706",
    "architect": "P84",
    "country of origin": "P495",
    "country": "P17",
    "capital": "P36",
    "capital of": "P1376",
    "publisher": "P123",
    "director": "P57",
    "father": "P22",
    "mother": "P25",
    "child": "P40",
    "sibling": "P3373",
    "spouse": "P26",
    "developer": "P178",
    "military branch": "P241",
    "mountain range": "P4552",
    "taxon rank": "P105",
    "location": "P276",
    "subsidiary": "P355",
    "operator": "P137",
    "record label": "P264",
    "genre": "P136",
    "tributary": "P974",
    "sister city": "P190",
    "instance of": "P31",
    "subclass of": "P279",
    "sport": "P641",
    "religion": "P140",
    "occupation": "P106",
    "member of political party": "P102",
    "residence": "P551",
    "work location": "P937",
    "field of work": "P101",
    "language of work or name": "P407",
    "applies to jurisdiction": "P1001",
    "notable work": "P800",
    "operating system": "P306",
    "characters": "P674",
    "manufacturer": "P176",
    "owned by": "P127",
    "member of": "P463",
    "crosses": "P177",
    "licensed to broadcast to": "P1408",
    "headquarters location": "P159",
    "main subject": "P921",
    "successful candidate": "P991",
    "member of sports team": "P54",
    "league": "P118",
    "screenwriter": "P58",
    "platform": "P400",
    "winner": "P1346",
    "constellation": "P59",
    "composer": "P86",
    "instrument": "P1303",
    "educated at": "P69",
    "nominated for": "P1411",
    "movement": "P135",
    "author": "P50",
    "founded by": "P112",
    "employer": "P108",
    "place of birth": "P19",
    "place of death": "P20",
    "award received": "P166",
    "creator": "P170",
}


def resolve_rel_iri(rel_label: str, *, fallback_ns: str = "opennre") -> str:
    """Relation label → IRI, mirroring the reference's two-tier
    resolution (kg.py:370-438 cache/API hit, rel.py:108-110 fallback):
    a known Wikidata property label yields the canonical
    ``wd:prop/direct/P…`` IRI; anything else yields the model-namespace
    literal ``{fallback_ns}:{label with '_'}`` EXACTLY as the reference
    constructs it when the API returns nothing."""
    pid = REL_PROP_CACHE.get(rel_label.strip().lower())
    if pid is not None:
        return NS_PREFIX["wd"] + "prop/direct/" + pid
    return f"{fallback_ns}:" + rel_label.replace(" ", "_")
