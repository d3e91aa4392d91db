"""Gated real-model extractor: spaCy parse → canonical SPANS rows.

The reference's extraction quality comes from real models — its
factory builds a spaCy pipeline with optional NER/coref components
(``/root/reference/textgraphs/pipe.py:440-511``).  This container has
no model downloads, so the engine's default extractor is the
deterministic rule stand-in (``stages/extract.py``); THIS module is the
production path: a ``try: import spacy`` gate (same pattern as
``stages/viz.py``'s networkx gating), an actor-pool callable that loads
the model ONCE per actor in ``__init__``, and registration under
``registry.extractors["spacy"]`` only when the gate passes.

Output schema is identical to ``ExtractSpans`` (doc_id, offset, kind,
text, media_ref, lemma_key, pos, label, sent_id, head_offset, dep_rel,
sub_obj, span_len) so the spec drops into every downstream pipeline
(build_nodes, blocking, scoring) unchanged — swapping rule-based for
model-based extraction is a one-line registry lookup.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import nlp

try:  # capability gate — never a hard dependency
    import spacy  # noqa: F401

    HAVE_SPACY = True
except ImportError:
    HAVE_SPACY = False


class SpacyExtractor:
    """documents(doc_id, text) → SPANS rows via a real spaCy parse.

    Mirrors the reference's per-token/entity/noun-chunk collection
    (``doc.py:242-459``): one ``lem`` row per non-punct token (``dep``
    for punctuation/determiners like the reference's stop-word split),
    one ``ent`` row per named entity, one ``chu`` row per noun chunk.
    Offsets are token indices; heads/relations come from the REAL
    dependency parse instead of the nearest-verb heuristic.
    """

    def __init__(self, *, model: str = "en_core_web_sm",
                 text_col: str = "text", id_col: str = "doc_id",
                 disable: tuple = (),
                 components: tuple = ()) -> None:
        """``components``: extra spaCy pipes appended after load, as
        (name, config) pairs — the reference's ``Component.augment_pipe``
        extension point (pipe.py:36-52); e.g. the SpanMarker NER wrapper
        (ner.py:17-65) is ``("span_marker", {"model": NER_MODEL})``."""
        if not HAVE_SPACY:
            raise ImportError(
                "spacy is not installed — register/use the default "
                "'spans' extractor instead (rule-based stand-in)")
        self.nlp = spacy.load(model, disable=list(disable))
        for name, config in components:
            self.nlp.add_pipe(name, config=dict(config))
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column(self.text_col).to_pylist()]
        doc_ids = batch.column(self.id_col).to_pylist()
        cols: dict[str, list] = {k: [] for k in (
            "doc_id", "offset", "kind", "text", "media_ref", "lemma_key",
            "pos", "label", "sent_id", "head_offset", "dep_rel", "sub_obj",
            "span_len")}

        # pipe() batches documents through the loaded model — the batch
        # is the inference unit, one model call per actor per batch
        for doc_id, doc in zip(doc_ids, self.nlp.pipe(texts)):
            sent_of = {}
            for si, sent in enumerate(doc.sents):
                for tok in sent:
                    sent_of[tok.i] = si
            for tok in doc:
                kind = "dep" if (tok.is_punct or tok.is_stop) else "lem"
                key = nlp.lemma_key_single(
                    tok.lemma_.lower(), tok.pos_,
                    placeholder_idx=tok.i if kind == "dep" else None)
                cols["doc_id"].append(doc_id)
                cols["offset"].append(tok.i)
                cols["kind"].append(kind)
                cols["text"].append(tok.text)
                cols["media_ref"].append("")
                cols["lemma_key"].append(key)
                cols["pos"].append(tok.pos_)
                cols["label"].append(
                    tok.ent_type_ if tok.ent_type_ else "")
                cols["sent_id"].append(sent_of.get(tok.i, 0))
                cols["head_offset"].append(tok.head.i)
                cols["dep_rel"].append(tok.dep_)
                cols["sub_obj"].append(tok.dep_ in (
                    "nsubj", "nsubjpass", "obj", "dobj", "iobj", "pobj"))
                cols["span_len"].append(1)
            for ent in doc.ents:
                lemmas = [t.lemma_.lower() for t in ent]
                poses = [t.pos_ for t in ent]
                cols["doc_id"].append(doc_id)
                cols["offset"].append(ent.start)
                cols["kind"].append("ent")
                cols["text"].append(ent.text)
                cols["media_ref"].append("")
                cols["lemma_key"].append(nlp.lemma_key_tokens(lemmas, poses))
                cols["pos"].append("PROPN")
                cols["label"].append(ent.label_)
                cols["sent_id"].append(sent_of.get(ent.start, 0))
                cols["head_offset"].append(ent.root.head.i)
                cols["dep_rel"].append(ent.root.dep_)
                cols["sub_obj"].append(ent.root.dep_ in (
                    "nsubj", "nsubjpass", "obj", "dobj", "iobj", "pobj"))
                cols["span_len"].append(len(ent))
            for chunk in doc.noun_chunks:
                lemmas = [t.lemma_.lower() for t in chunk]
                poses = [t.pos_ for t in chunk]
                cols["doc_id"].append(doc_id)
                cols["offset"].append(chunk.start)
                cols["kind"].append("chu")
                cols["text"].append(chunk.text)
                cols["media_ref"].append("")
                cols["lemma_key"].append(nlp.lemma_key_tokens(lemmas, poses))
                cols["pos"].append("NOUN")
                cols["label"].append("")
                cols["sent_id"].append(sent_of.get(chunk.start, 0))
                cols["head_offset"].append(chunk.root.head.i)
                cols["dep_rel"].append("noun_chunk")
                cols["sub_obj"].append(False)
                cols["span_len"].append(len(chunk))

        return pa.table({
            "doc_id": pa.array(cols["doc_id"], pa.string()),
            "offset": pa.array(np.asarray(cols["offset"], np.int32)),
            "kind": pa.array(cols["kind"], pa.string()),
            "text": pa.array(cols["text"], pa.string()),
            "media_ref": pa.array(cols["media_ref"], pa.string()),
            "lemma_key": pa.array(cols["lemma_key"], pa.string()),
            "pos": pa.array(cols["pos"], pa.string()),
            "label": pa.array(cols["label"], pa.string()),
            "sent_id": pa.array(np.asarray(cols["sent_id"], np.int32)),
            "head_offset": pa.array(np.asarray(cols["head_offset"], np.int32)),
            "dep_rel": pa.array(cols["dep_rel"], pa.string()),
            "sub_obj": pa.array(cols["sub_obj"], pa.bool_()),
            "span_len": pa.array(np.asarray(cols["span_len"], np.int32)),
        })


def spacy_extractor_spec(**kwargs):
    """→ StageSpec for the spaCy extractor (raises if spacy absent).

    Actor pool (model load in ``__init__`` happens once per actor),
    modest batch size — model inference dominates per-batch cost."""
    from ..registry import StageSpec

    if not HAVE_SPACY:
        raise ImportError("spacy is not installed")
    return StageSpec(SpacyExtractor, batch_size=64, concurrency=(1, 4),
                     kwargs=kwargs)
