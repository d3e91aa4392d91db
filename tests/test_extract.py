"""Extraction stage tests: span-sequence invariant + Herzog golden
(FIXTURES.md F1; reference tests/test_extract.py:20-74)."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from textgraphs_ray.pipelines.er import extract_spans, spanify_text
from textgraphs_ray.pipelines.phrases import ranked_phrases


def test_span_sequence_equality(small_corpus):
    """Per-row invariant: exploded rows, regrouped by doc and sorted by
    offset, reproduce the input span sequence (kind, text, media_ref,
    order) exactly."""
    docs, _, _ = small_corpus
    spans = extract_spans(rd.from_arrow(docs)).to_pandas()
    grouped = {
        doc_id: [(r.kind, r.text, r.media_ref, r.offset)
                 for r in g.sort_values("offset").itertuples()]
        for doc_id, g in spans.groupby("doc_id")
    }
    doc_ids = docs.column("doc_id").to_pylist()
    span_lists = docs.column("spans").to_pylist()
    assert set(grouped) == set(doc_ids)
    for doc_id, span_list in zip(doc_ids, span_lists):
        expected = [(s["kind"], s["text"], s["media_ref"], s["offset"])
                    for s in sorted(span_list, key=lambda s: s["offset"])]
        assert grouped[doc_id] == expected, doc_id


def test_herzog_fixture_lemma_keys(herzog_docs):
    """FIXTURES.md F1 expected rows."""
    docs = spanify_text(rd.from_arrow(herzog_docs)).materialize()
    spans = extract_spans(docs).to_pandas().sort_values("offset")
    by_offset = {int(r.offset): r for r in spans.itertuples()}
    assert by_offset[0].kind == "ent"
    assert by_offset[0].lemma_key == "werner.PROPN.herzog.PROPN"
    assert by_offset[2].lemma_key == "2.be.AUX"
    assert by_offset[4].lemma_key == "4.remarkable.ADJ"
    assert by_offset[5].lemma_key == "filmmaker.NOUN"
    assert by_offset[10].kind == "ent"
    assert by_offset[10].lemma_key == "germany.PROPN"
    assert by_offset[15].kind == "ent"
    assert by_offset[15].lemma_key == "dietrich.PROPN.herzog.PROPN"


def test_herzog_golden_top4(herzog_docs):
    """Reference tests/test_extract.py:55-70: top-4 ranked phrases
    contain Germany, Werner Herzog, Dietrich Herzog."""
    docs = spanify_text(rd.from_arrow(herzog_docs)).materialize()
    spans = extract_spans(docs)
    ph = ranked_phrases(docs, spans).to_pandas()
    top4 = set(zip(ph.head(4)["text"], ph.head(4)["pos"]))
    assert {("Germany", "PROPN"), ("Werner Herzog", "PROPN"),
            ("Dietrich Herzog", "PROPN")} <= top4
    # entity labels normalized to prefixed IRIs (M6/M9)
    labels = dict(zip(ph["text"], ph["label"]))
    assert labels["Werner Herzog"] == "dbo:Person"
    assert labels["Germany"] == "dbo:Country"


def test_spanify_noun_chunks(herzog_docs):
    docs = spanify_text(rd.from_arrow(herzog_docs)).to_pandas()
    kinds = [(s["kind"], s["text"]) for s in docs.iloc[0]["spans"]]
    assert ("chu", "a remarkable filmmaker") in kinds
    assert ("chu", "the son") in kinds
    # chunks equal to entity spans are NOT re-emitted (J3 anti-join)
    assert ("chu", "Werner Herzog") not in kinds
