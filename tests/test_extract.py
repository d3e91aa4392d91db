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


def test_flat_analyzer_matches_per_doc_reference():
    """analyze_spans_flat (the batch-vectorized ExtractSpans core) is
    bit-identical to per-document analyze_spans on varied corpora."""
    import numpy as np
    import pyarrow as pa

    from textgraphs_ray.corpus import generate
    from textgraphs_ray.schema import SPANS
    from textgraphs_ray.stages.extract import ExtractSpans, analyze_spans

    def per_doc_reference(batch: pa.Table) -> pa.Table:
        spans_list = batch.column("spans").combine_chunks()
        doc_ids = batch.column("doc_id").to_pylist()
        lengths = np.diff(spans_list.offsets.to_numpy(zero_copy_only=False))
        flat = spans_list.flatten()
        kinds = flat.field("kind").to_pylist()
        texts = flat.field("text").to_pylist()
        media = flat.field("media_ref").to_pylist()
        offs = flat.field("offset").to_pylist()
        out = {"doc_id": list(np.repeat(np.asarray(doc_ids, object),
                                        lengths)),
               "offset": offs, "kind": kinds, "text": texts,
               "media_ref": media,
               "lemma_key": [], "pos": [], "label": [], "sent_id": [],
               "head_offset": [], "dep_rel": [], "sub_obj": [],
               "span_len": []}
        pos = 0
        for ln in lengths:
            ln = int(ln)
            d = analyze_spans(kinds[pos:pos + ln], texts[pos:pos + ln],
                              media[pos:pos + ln], offs[pos:pos + ln])
            for k in ("lemma_key", "pos", "label", "sent_id",
                      "head_offset", "dep_rel", "sub_obj", "span_len"):
                out[k].extend(d[k])
            pos += ln
        return pa.Table.from_pydict(out, schema=SPANS)

    ex = ExtractSpans()
    for seed, nd, filler in [(42, 120, 0), (7, 80, 30), (1, 10, 5)]:
        docs, _, _ = generate(nd, seed=seed, filler_spans=filler)
        assert per_doc_reference(docs).equals(ex(docs)), (seed, nd, filler)
