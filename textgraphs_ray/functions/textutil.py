"""Small scalar text utilities (SURVEY.md M10/M14/§2.8).

- :func:`strip_markdown` — markdown → plain text (reference
  ``kg.py:553-572`` uses markdown2 + BeautifulSoup; this is a regex
  equivalent with the same intent: clean remote-API result strings).
- :func:`iri_to_lemma_key` / :func:`lemma_key_to_iri` — the IRI ↔
  lemma-key round trip (reference ``doc.py:1085-1100``).
"""

from __future__ import annotations

import re

_MD_PATTERNS = [
    (re.compile(r"```.*?```", re.S), " "),          # fenced code
    (re.compile(r"`([^`]*)`"), r"\1"),              # inline code
    (re.compile(r"!\[([^\]]*)\]\([^)]*\)"), r"\1"),  # images
    (re.compile(r"\[([^\]]*)\]\([^)]*\)"), r"\1"),   # links
    (re.compile(r"^#{1,6}\s*", re.M), ""),           # headings
    (re.compile(r"(\*\*|__)(.*?)\1"), r"\2"),        # bold
    (re.compile(r"(\*|_)(.*?)\1"), r"\2"),           # italics
    (re.compile(r"^\s*[-*+]\s+", re.M), ""),         # bullets
    (re.compile(r"<[^>]+>"), " "),                    # html tags
]


def strip_markdown(text: str) -> str:
    out = text
    for pat, repl in _MD_PATTERNS:
        out = pat.sub(repl, out)
    return " ".join(out.split())


ENTITY_NS = "https://github.com/DerwenAI/textgraphs/ns/entity/"


def lemma_key_to_iri(key: str) -> str:
    """lemma key → entity IRI slug (reference doc.py:1013 munging)."""
    return ENTITY_NS + key.replace(" ", "_").replace(".", "_")


def iri_to_lemma_key(iri: str) -> str:
    """entity IRI → lemma key (reference doc.py:1085-1100 inverse).

    Round-trip caveat mirrored from the reference: '.' and '_' both map
    to '_' in the slug, so keys are reconstructed by treating every '_'
    as the '.' separator (lemma text containing literal '_' is not
    round-trippable — same as the reference).
    """
    slug = iri[len(ENTITY_NS):] if iri.startswith(ENTITY_NS) else iri
    return slug.replace("_", ".")


def best_alias_match(candidates: list[tuple[str, float]]) -> tuple[str, float] | None:
    """O2: max-probability candidate with deterministic tie-break
    (reference kg.py:536-550: sort (prob, label) desc, take head,
    early-exit on exact 1.0)."""
    if not candidates:
        return None
    return max(candidates, key=lambda c: (c[1], c[0]))
