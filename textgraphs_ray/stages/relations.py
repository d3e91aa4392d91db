"""Relation inference: entity-pair generation + scorer actor pool
(SURVEY.md J12/T3/T4/M11/H7).

The reference infers relations with OpenNRE and REBEL transformer
models (``/root/reference/textgraphs/rel.py:28-307``) over entity pairs
bounded by graph distance ≤ MAX_SKIP=11 (``pipe.py:379-431``,
``defaults.py:22``).  Per SURVEY H7, the global-graph Dijkstra bound is
re-specified block-locally: pairs are generated per document from the
span sequence with an offset-distance cap — pure span algebra, no
shuffle.

The scorer is a stateful actor pool whose "model" is deterministic (no
model downloads here): the relation label is the lemma of the nearest
verb span between the two entities, accepted with the reference's
probability floor (OpenNRE ``min_prob = 0.9``, rel.py:98).  A real
OpenNRE/REBEL model drops into the same class body.

:func:`parse_rebel_triplets` reimplements the REBEL generated-sequence
decoder (state machine over ``<triplet>/<subj>/<obj>`` markers,
reference rel.py:174-256) so a real seq2seq output stream can be
plugged in unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..functions import kg

MAX_SKIP = 11      # reference defaults.py:22
MIN_PROB = 0.9     # reference defaults.py:28 / rel.py:98


def parse_rebel_triplets(decoded: str) -> list[dict]:
    """Decode an mREBEL-format generated token stream into typed triples
    ``{head, head_type, type, tail, tail_type}``.

    State machine with the same semantics as the reference decoder
    (rel.py:202-254): ``<triplet>``/``<relation>`` opens a new subject;
    any other ``<X>`` marker is an entity-type tag — after subject or
    relation text it types the subject and opens the object, otherwise
    it types the object and opens the relation text.  Special tokens
    (``<s> </s> <pad> tp_XX __en__``) are stripped first.  Unlike the
    reference's final flush (which emits a ``rel`` key, rel.py:253),
    every emitted triple here uses the same key set.
    """
    triplets: list[dict] = []
    state = "x"
    subject = subject_type = relation = object_ = object_type = ""
    text = decoded.strip()
    for tok in ("<s>", "<pad>", "</s>", "tp_XX", "__en__"):
        text = text.replace(tok, "")

    def flush() -> None:
        triplets.append({
            "head": subject.strip(), "head_type": subject_type,
            "type": relation.strip(),
            "tail": object_.strip(), "tail_type": object_type,
        })

    for token in text.split():
        if token in ("<triplet>", "<relation>"):
            state = "t"
            if relation:
                flush()
                relation = ""
            subject = ""
        elif token.startswith("<") and token.endswith(">"):
            if state in ("t", "o"):
                if relation:
                    flush()
                state = "s"
                object_ = ""
                subject_type = token[1:-1]
            else:
                state = "o"
                object_type = token[1:-1]
                relation = ""
        elif state == "t":
            subject += " " + token
        elif state == "s":
            object_ += " " + token
        elif state == "o":
            relation += " " + token
    if subject and relation and object_ and subject_type and object_type:
        flush()
    return triplets


class RelationScorer:
    """Actor-pool stage over documents: emits INF edge rows.

    ``__init__`` is where a real model loads (14.5 s for mrebel-large
    per reference docs/ex0_0.md:661-663 — amortized per actor here);
    ``__call__`` runs batched over documents.
    """

    def __init__(self, *, max_skip: int = MAX_SKIP,
                 min_prob: float = MIN_PROB) -> None:
        self.max_skip = max_skip
        self.min_prob = min_prob
        # the stand-in classifier's label space IS the model's trained
        # vocabulary (OpenNRE wiki80 — the public property labels in
        # REL_PROP_CACHE): a real RE head returns argmax over exactly
        # this set, never a raw verb from the text
        self._vocab = sorted(kg.REL_PROP_CACHE)

    def _score(self, rel_lemma: str) -> float:
        """Deterministic stand-in for the model softmax: stable in
        [0.88, 1.0) per relation label."""
        import hashlib
        h = int(hashlib.blake2b(rel_lemma.encode(), digest_size=4)
                .hexdigest(), 16)
        return 0.88 + (h % 1000) / 1000.0 * 0.12

    def _score_pair(self, span_texts: list, i: int, j: int,
                    rel_lemma: str) -> tuple:
        """Pair-scoring hook → (prob, model_rel_label | None).

        The base class is the deterministic model stand-in: the
        connecting verb lemma maps stably into the wiki80 label space
        (a real classifier also returns one of its trained relation
        labels, never the verb itself), and the probability is a
        stable pseudo-softmax.  :class:`OpenNREScorer` overrides this
        with real model inference over the pair's sentence context."""
        del span_texts, i, j
        import hashlib
        h = int(hashlib.blake2b(rel_lemma.encode(), digest_size=4)
                .hexdigest(), 16)
        return self._score(rel_lemma), self._vocab[h % len(self._vocab)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .extract import analyze_spans

        spans_list = batch.column("spans").combine_chunks()
        lengths = np.diff(spans_list.offsets.to_numpy(zero_copy_only=False))
        flat = spans_list.flatten()
        kinds = flat.field("kind").to_pylist()
        texts = flat.field("text").to_pylist()
        media = flat.field("media_ref").to_pylist()
        offs = flat.field("offset").to_pylist()

        src, dst, rel, iri, prob = [], [], [], [], []
        pos0 = 0
        for ln in lengths:
            ln = int(ln)
            k = kinds[pos0:pos0 + ln]
            t = texts[pos0:pos0 + ln]
            d = analyze_spans(k, t, media[pos0:pos0 + ln],
                              offs[pos0:pos0 + ln])
            keys = d["lemma_key"]
            o = offs[pos0:pos0 + ln]
            ents = [i for i in range(ln) if k[i] == "ent"]
            verbs = [(o[i], d["lemma_key"][i].split(".")[0])
                     for i in range(ln)
                     if k[i] == "lem" and d["pos"][i] == "VERB"]
            # ordered pairs within the offset window (J12 block-local)
            for ai in range(len(ents)):
                for bi in range(ai + 1, len(ents)):
                    i, j = ents[ai], ents[bi]
                    if abs(o[j] - o[i]) > self.max_skip:
                        continue
                    between = [v for vo, v in verbs if o[i] < vo < o[j]]
                    if not between:
                        continue
                    rl = between[0]
                    p, model_rel = self._score_pair(t, i, j, rl)
                    if model_rel is not None:
                        rl = model_rel
                    if p < self.min_prob:
                        continue
                    src.append(keys[i]); dst.append(keys[j])
                    rel.append(rl); iri.append(self.resolve_rel_iri(rl))
                    prob.append(p)
            pos0 += ln
        return pa.table({
            "src_key": pa.array(src, pa.string()),
            "dst_key": pa.array(dst, pa.string()),
            "kind": pa.array(["inf"] * len(src), pa.string()),
            "rel": pa.array(iri, pa.string()),
            "rel_label": pa.array(rel, pa.string()),
            "prob": pa.array(prob, pa.float64()),
        })

    @staticmethod
    def resolve_rel_iri(label: str) -> str:
        """rel label → IRI via the pre-resolved Wikidata property
        cache (functions/kg.py REL_PROP_CACHE — the reference's warm
        ``iri_cache``, kg.py:394-396, built offline from the RE
        models' public training vocabulary) with the reference's
        literal fallback ``opennre:label_with_underscores``
        (rel.py:108-110) for labels outside it.  Deterministic, so the
        broadcast join is implicit — every worker resolves a label
        identically."""
        return kg.resolve_rel_iri(label, fallback_ns="opennre")


def infer_relations(docs_ds: "ray.data.Dataset", *,
                    concurrency=(1, 4),
                    batch_size: int = 256) -> "ray.data.Dataset":
    """documents → INF edge rows via the relation-scorer actor pool."""
    return docs_ds.map_batches(
        RelationScorer, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


try:  # capability gate — never a hard dependency (pipe.py:161-209)
    import opennre  # noqa: F401

    HAVE_OPENNRE = True
except ImportError:
    HAVE_OPENNRE = False


class OpenNREScorer(RelationScorer):
    """Real OpenNRE kernel behind the relation scorer (reference
    ``rel.py:210-307``, loaded once per actor like the reference's
    factory — 0.9 s per ``docs/ex0_0.md:667``).

    ``model`` is injectable (anything with ``.infer(item) ->
    (label, prob)``) so the wiring is testable without downloads; by
    default the gated ``opennre.get_model(model_name)`` loads in
    ``__init__`` — once per actor, never per batch."""

    def __init__(self, *, model_name: str = "wiki80_cnn_softmax",
                 model=None, **kwargs) -> None:
        super().__init__(**kwargs)
        if model is not None:
            self.model = model
        else:
            if not HAVE_OPENNRE:
                raise ImportError(
                    "opennre is not installed — use RelationScorer "
                    "(deterministic stand-in) instead")
            self.model = opennre.get_model(model_name)

    def _score_pair(self, span_texts: list, i: int, j: int,
                    rel_lemma: str) -> tuple:
        # reconstruct the token-joined text + char spans the OpenNRE
        # API expects (reference Node.get_pos, elem.py:166-176)
        starts = []
        pos = 0
        for t in span_texts:
            starts.append(pos)
            pos += len(t or "") + 1
        text = " ".join(t or "" for t in span_texts)
        h_pos = (starts[i], starts[i] + len(span_texts[i] or "") - 1)
        t_pos = (starts[j], starts[j] + len(span_texts[j] or "") - 1)
        label, prob = self.model.infer(
            {"text": text, "h": {"pos": h_pos}, "t": {"pos": t_pos}})
        return float(prob), label


try:  # capability gate — never a hard dependency (pipe.py:161-209)
    import transformers  # noqa: F401

    HAVE_TRANSFORMERS = True
except ImportError:
    HAVE_TRANSFORMERS = False


def make_rebel_decode(pipe) -> "callable":
    """Build the texts→decoded-strings closure around an HF translation
    pipeline, decoding the way the reference does (``rel.py:145-171``):
    generate raw token ids (``return_tensors=True``, mREBEL's
    ``decoder_start_token_id=250058``) and ``tokenizer.batch_decode``
    them with special tokens KEPT — the pipeline's default text output
    strips the ``<triplet>``/entity-type markers
    :func:`parse_rebel_triplets` keys on, silently yielding zero
    triples.  Factored out of :class:`RebelGenerator` so the decode
    shape is pinned by a fake-pipeline test without model downloads."""

    def generate(texts: list) -> list:
        outs = pipe(texts, decoder_start_token_id=250058,
                    src_lang="en_XX", tgt_lang="<triplet>",
                    return_tensors=True, return_text=False)
        return pipe.tokenizer.batch_decode(
            [o["translation_token_ids"] for o in outs])

    return generate


class RebelGenerator:
    """Real mREBEL seq2seq kernel (reference ``rel.py:28-106``): the HF
    generation pipeline loads ONCE per actor in ``__init__`` (the
    reference's ``pipeline("translation_xx_to_yy", ...)`` factory),
    every batch generates the ``<triplet>...`` linearization for its
    texts, and the SAME :func:`parse_rebel_triplets` state machine
    used by the deterministic stand-in decodes it — so swapping the
    stand-in for the model changes the kernel, not the plumbing.

    ``generator`` is injectable (``texts -> list[str]`` of decoded
    strings) so the stage is testable without model downloads — this
    sandbox has none; with transformers installed the gated default
    loads ``model_name``.  Registered as ``inferrers["mrebel"]`` when
    the gate is up (registry.py)."""

    def __init__(self, *, model_name: str = "Babelscape/mrebel-large",
                 generator=None, text_col: str = "text",
                 id_col: str = "doc_id") -> None:
        self.text_col = text_col
        self.id_col = id_col
        if generator is not None:
            self.generate = generator
        else:
            if not HAVE_TRANSFORMERS:
                raise ImportError(
                    "transformers is not installed — use RelationScorer "
                    "(deterministic stand-in) instead")
            from transformers import pipeline

            pipe = pipeline("translation_xx_to_yy", model=model_name,
                            tokenizer=model_name)
            self.generate = make_rebel_decode(pipe)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        decoded = self.generate([t or "" for t in texts])
        out = {"doc_id": [], "head": [], "head_type": [], "rel": [],
               "tail": [], "tail_type": [], "iri": []}
        from ..functions.kg import resolve_rel_iri

        for did, dec in zip(ids, decoded):
            for trip in parse_rebel_triplets(dec or ""):
                out["doc_id"].append(did)
                out["head"].append(trip["head"])
                out["head_type"].append(trip["head_type"])
                out["rel"].append(trip["type"])
                out["tail"].append(trip["tail"])
                out["tail_type"].append(trip["tail_type"])
                out["iri"].append(
                    resolve_rel_iri(trip["type"], fallback_ns="mrebel"))
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "head": pa.array(out["head"], pa.string()),
            "head_type": pa.array(out["head_type"], pa.string()),
            "rel": pa.array(out["rel"], pa.string()),
            "tail": pa.array(out["tail"], pa.string()),
            "tail_type": pa.array(out["tail_type"], pa.string()),
            "iri": pa.array(out["iri"], pa.string()),
        })
