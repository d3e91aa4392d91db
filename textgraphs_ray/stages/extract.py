"""Span extraction + lemma normalization stages (SURVEY.md M1-M8).

Two ``map_batches`` stages, both expressed as callable classes so Ray
Data runs them as actor pools (linguistic tables compiled once per
actor, per reference ``pipe.py:434-438`` "one of the more expensive
operations"):

- :class:`Spanify` — raw-text documents → canonical input-hint table
  ``documents(doc_id, spans:list<struct<kind,text,media_ref,offset>>)``.
  Stand-in for the reference's three spaCy parses
  (``pipe.py:216-270``); kind priority ENT > LEM(NOUN/PROPN/VERB) > DEP
  (``doc.py:199-239``), plus ``chu`` spans for unseen noun chunks
  (``pipe.py:327-373``, re-specified as span algebra per SURVEY H5).

- :class:`ExtractSpans` — canonical documents → exploded ``SPANS`` rows
  with the invariant ``lemma_key`` (``pipe.py:273-311``), POS, NER
  label, sentence ids, and intra-row dependency heads
  (``doc.py:440-463``).  Head resolution never leaves the row: no
  shuffle, zero-copy Arrow in/out.

Per-row invariant: the emitted rows, re-grouped by ``doc_id`` and
sorted by ``offset``, reproduce the input span sequence
``(kind, text, media_ref, order)`` exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import nlp
from ..schema import SPANS

_SENT_FINAL = {".", "!", "?"}


class Spanify:
    """documents(doc_id, text) → documents(doc_id, spans) [input-hint schema].

    Stateful stage: the "parser" (closed-class tables, compiled
    regexes) is built once per actor in ``__init__``.
    """

    def __init__(self, *, text_col: str = "text", id_col: str = "doc_id") -> None:
        self.text_col = text_col
        self.id_col = id_col
        # touch module-level compiled state so load cost lands here
        self._parse = nlp.parse

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = [str(v) for v in batch.column(self.id_col).to_pylist()]
        texts = batch.column(self.text_col).to_pylist()
        span_col: list[list[dict]] = []
        for text in texts:
            doc = self._parse(text or "")
            spans: list[dict] = []
            ent_starts = {e.start: e for e in doc.ents}
            ent_member = set()
            for e in doc.ents:
                ent_member.update(range(e.start, e.start + e.length))
            for t in doc.tokens:
                if t.i in ent_member:
                    e = ent_starts.get(t.i)
                    if e is not None:
                        spans.append({"kind": "ent", "text": e.text,
                                      "media_ref": "", "offset": e.start})
                    continue
                if t.pos in ("NOUN", "PROPN", "VERB"):
                    kind = "lem"
                else:
                    kind = "dep"
                spans.append({"kind": kind, "text": t.text,
                              "media_ref": "", "offset": t.i})
            # unseen noun chunks: multi-token chunks not identical to an
            # entity span and containing >1 nominal (pipe.py:350-358)
            ent_exact = {(e.start, e.length) for e in doc.ents}
            for c in doc.chunks:
                if c.length > 1 and (c.start, c.length) not in ent_exact:
                    spans.append({"kind": "chu", "text": c.text,
                                  "media_ref": "", "offset": c.start})
            spans.sort(key=lambda s: (s["offset"], s["kind"]))
            span_col.append(spans)
        from ..schema import DOCUMENTS
        return pa.Table.from_pydict(
            {"doc_id": doc_ids, "spans": span_col}, schema=DOCUMENTS)


def _pos_lemmas_for_span(kind: str, text: str) -> tuple[str, list[str], list[str]]:
    """Return (pos, lemmas, poses) for one span's token sequence.

    Memoized per worker process on (kind, text): corpora repeat surface
    forms constantly (function words, shared vocabulary, hot entities),
    so the pos/lemma work runs once per distinct form per worker — the
    cache is the batch-level analogue of the reference's per-pipeline
    lemma memo.  Bounded so adversarial high-cardinality text cannot
    grow it without limit.
    """
    hit = _SPAN_MEMO.get((kind, text))
    if hit is not None:
        return hit
    words = text.split(" ") if text else []
    if kind == "ent":
        lemmas = [nlp.lemma_of(w) for w in words]
        poses = ["PROPN"] * len(words)
        out: tuple = ("PROPN", lemmas, poses)
    elif not words:
        out = ("", [], [])
    else:
        w = words[0]
        pos = nlp.pos_of(w, sent_initial=False, prev_pos="")
        out = (pos, [nlp.lemma_of(w)], [pos])
    if len(_SPAN_MEMO) < 500_000:
        _SPAN_MEMO[(kind, text)] = out
    return out


_SPAN_MEMO: dict[tuple[str, str], tuple] = {}


def analyze_spans(kinds: list[str], texts: list[str], media_refs: list[str],
                  offsets: list[int]) -> dict[str, list]:
    """Pure function of one document's span sequence → derived columns.

    Sentence ids come from sentence-final punctuation ``dep`` spans;
    dependency heads use the deterministic nearest-following-verb rule
    (stand-in for the reference's spaCy heads, ``doc.py:440-459``).
    ``chu`` spans take the multi-token lemma key like entities.
    """
    n = len(kinds)
    pos_col = [""] * n
    key_col = [""] * n
    label_col = [""] * n
    sent_col = [0] * n
    head_col = [0] * n
    dep_col = [""] * n
    subobj_col = [False] * n
    len_col = [1] * n

    # sentence segmentation
    sent = 0
    sent_of: list[int] = []
    for i in range(n):
        sent_of.append(sent)
        if kinds[i] == "dep" and texts[i] in _SENT_FINAL:
            sent += 1

    for i in range(n):
        kind, text = kinds[i], texts[i]
        sent_col[i] = sent_of[i]
        if kind == "media":
            key_col[i] = "media:" + media_refs[i]
            len_col[i] = 1
            dep_col[i] = "media"
            head_col[i] = offsets[i]
            continue
        pos, lemmas, poses = _pos_lemmas_for_span(kind, text)
        pos_col[i] = pos
        len_col[i] = max(1, len(lemmas))
        if kind == "dep":
            key_col[i] = nlp.lemma_key_single(
                lemmas[0] if lemmas else "", pos, placeholder_idx=offsets[i])
        elif kind in ("ent", "chu"):
            key_col[i] = nlp.lemma_key_tokens(lemmas, poses)
            if kind == "ent":
                label_col[i] = nlp.ner_label(text)
        elif kind == "iri":
            key_col[i] = text
            label_col[i] = text
        else:  # lem
            key_col[i] = nlp.lemma_key_single(lemmas[0] if lemmas else "", pos)

    # dependency heads per sentence over non-chu, non-media spans
    by_sent: dict[int, list[int]] = {}
    for i in range(n):
        if kinds[i] in ("chu", "media"):
            head_col[i] = offsets[i]
            dep_col[i] = dep_col[i] or "noun_chunk"
            continue
        by_sent.setdefault(sent_of[i], []).append(i)
    for _, idxs in by_sent.items():
        verbs = [i for i in idxs if pos_col[i] in ("VERB", "AUX")]
        root = verbs[0] if verbs else idxs[0]
        for j, i in enumerate(idxs):
            if i == root:
                head_col[i] = offsets[i]
                dep_col[i] = "ROOT"
                continue
            nxt = next((v for v in verbs if v > i), root)
            head_col[i] = offsets[nxt]
            pos = pos_col[i]
            if pos in ("NOUN", "PROPN"):
                if i < root:
                    dep_col[i] = "nsubj"
                    subobj_col[i] = True
                elif j > 0 and pos_col[idxs[j - 1]] == "ADP":
                    dep_col[i] = "pobj"
                    subobj_col[i] = True
                else:
                    dep_col[i] = "obj" if pos == "NOUN" else "appos"
            elif pos == "PUNCT":
                dep_col[i] = "punct"
                head_col[i] = offsets[root]
            elif pos == "DET":
                dep_col[i] = "det"
            elif pos == "ADJ":
                dep_col[i] = "amod"
            elif pos == "ADP":
                dep_col[i] = "prep"
            else:
                dep_col[i] = "dep"

    return {"pos": pos_col, "lemma_key": key_col, "label": label_col,
            "sent_id": sent_col, "head_offset": head_col, "dep_rel": dep_col,
            "sub_obj": subobj_col, "span_len": len_col}


def analyze_spans_flat(kinds: list[str], texts: list[str],
                       media: list[str], offs: np.ndarray,
                       lengths: np.ndarray) -> dict[str, np.ndarray]:
    """Batch-flat vectorized :func:`analyze_spans`: same derived columns
    for ALL documents of a batch in one pass (``lengths`` gives the
    per-doc span counts; spans are concatenated in doc order).

    Bit-identical to calling :func:`analyze_spans` per document (tested
    against it), but the per-span Python loop is replaced by a
    factorize-once / compute-per-distinct / scatter pattern plus
    segment-vectorized sentence + dependency-head resolution — the
    extraction stage dominated the 800k-doc scaling run (~2.7 ms/doc),
    and corpora repeat surface forms constantly, so per-distinct work
    is a small fraction of per-span work.
    """
    import pandas as pd

    combo = [k + "\x1f" + t for k, t in zip(kinds, texts)]
    codes, uniq = pd.factorize(np.asarray(combo, dtype=object), sort=False)
    return _analyze_from_codes(
        list(uniq), codes.astype(np.int64),
        lambda idxs: [media[i] for i in idxs],
        np.asarray(offs, dtype=np.int64), lengths)


def _analyze_from_codes(uniq: list, codes: np.ndarray, media_at,
                        offs: np.ndarray,
                        lengths: np.ndarray) -> dict[str, np.ndarray]:
    """Core of :func:`analyze_spans_flat` on pre-factorized spans:
    ``uniq`` holds distinct ``kind + "\\x1f" + text`` strings, ``codes``
    maps each span to its distinct form, ``media_at(idxs)`` returns the
    media refs for the given span indices (lazy — only media spans pay
    the lookup)."""
    n = len(codes)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        e = np.zeros(0, dtype=object)
        return {"pos": e, "lemma_key": e, "label": e, "sent_id": z,
                "head_offset": z, "dep_rel": e,
                "sub_obj": np.zeros(0, dtype=bool), "span_len": z}
    u = len(uniq)

    # per-distinct (kind, text) analysis — one _pos_lemmas_for_span call
    # per distinct form per batch (plus the per-worker memo underneath)
    pos_u = np.empty(u, dtype=object)
    stub_u = np.empty(u, dtype=object)   # key for lem; "lemma.pos" stub for dep
    label_u = np.empty(u, dtype=object)
    len_u = np.ones(u, dtype=np.int64)
    final_u = np.zeros(u, dtype=bool)    # sentence-final punctuation
    verb_u = np.zeros(u, dtype=bool)
    excl_u = np.zeros(u, dtype=bool)     # chu/media: excluded from heads
    kind_u = np.empty(u, dtype=object)
    for j, cmb in enumerate(uniq):
        k, t = cmb.split("\x1f", 1)
        kind_u[j] = k
        if k == "media":
            pos_u[j] = ""
            stub_u[j] = ""
            label_u[j] = ""
            excl_u[j] = True
            continue
        pos, lemmas, poses = _pos_lemmas_for_span(k, t)
        pos_u[j] = pos
        len_u[j] = max(1, len(lemmas))
        verb_u[j] = pos in ("VERB", "AUX")
        if k == "dep":
            stub_u[j] = nlp.lemma_key_single(lemmas[0] if lemmas else "",
                                             pos)
            label_u[j] = ""
            final_u[j] = t in _SENT_FINAL
        elif k in ("ent", "chu"):
            stub_u[j] = nlp.lemma_key_tokens(lemmas, poses)
            label_u[j] = nlp.ner_label(t) if k == "ent" else ""
            excl_u[j] = k == "chu"
        elif k == "iri":
            stub_u[j] = t
            label_u[j] = t
        else:  # lem
            stub_u[j] = nlp.lemma_key_single(lemmas[0] if lemmas else "",
                                             pos)
            label_u[j] = ""

    pos_col = pos_u[codes]
    label_col = label_u[codes]
    len_col = len_u[codes]
    key_col = stub_u[codes].copy()
    kind_code = kind_u[codes]

    # occurrence-level keys: dep keys carry the span offset placeholder
    # (stopwords never merge); media keys carry the asset ref
    dep_mask = kind_code == "dep"
    if dep_mask.any():
        import pyarrow.compute as pc

        # most spans of a web document are dep — keep the per-span
        # string concat in Arrow, not a Python f-string loop
        di = np.nonzero(dep_mask)[0]
        joined = pc.binary_join_element_wise(
            pc.cast(pa.array(offs[di]), pa.string()),
            pa.array(key_col[di], pa.string()), ".")
        key_col[di] = joined.to_numpy(zero_copy_only=False)
    media_mask = kind_code == "media"
    if media_mask.any():
        mi = np.nonzero(media_mask)[0]
        key_col[mi] = ["media:" + r for r in media_at(mi)]

    # sentence ids: exclusive running count of sentence-final spans,
    # reset at each document start
    flags = final_u[codes].astype(np.int64)
    excl_prefix = np.zeros(n, dtype=np.int64)
    np.cumsum(flags[:-1], out=excl_prefix[1:])
    starts = np.zeros(len(lengths), dtype=np.int64)
    np.cumsum(np.asarray(lengths[:-1], dtype=np.int64), out=starts[1:])
    sent_col = excl_prefix - np.repeat(excl_prefix[starts], lengths)

    head_col = offs.copy()               # default: chu/media head = self
    dep_col = np.full(n, "", dtype=object)
    subobj_col = np.zeros(n, dtype=bool)
    dep_col[media_mask] = "media"
    dep_col[kind_code == "chu"] = "noun_chunk"

    # dependency heads over (doc, sentence) segments of included spans
    inc_mask = ~excl_u[codes]
    inc = np.nonzero(inc_mask)[0]
    m = len(inc)
    if m:
        doc_idx = np.repeat(np.arange(len(lengths), dtype=np.int64),
                            lengths)
        d_i = doc_idx[inc]
        s_i = sent_col[inc]
        boundary = np.ones(m, dtype=bool)
        boundary[1:] = (d_i[1:] != d_i[:-1]) | (s_i[1:] != s_i[:-1])
        seg_id = np.cumsum(boundary) - 1
        seg_start = np.nonzero(boundary)[0]
        p = np.arange(m, dtype=np.int64)
        is_verb = verb_u[codes][inc]
        verb_pos = np.nonzero(is_verb)[0]
        seg_of_verb = seg_id[verb_pos]

        if len(verb_pos):
            # root of each segment: its first verb, else its first span
            fv = np.searchsorted(verb_pos, seg_start)
            fv_c = np.minimum(fv, len(verb_pos) - 1)
            root_seg = np.where(
                (fv < len(verb_pos))
                & (seg_of_verb[fv_c] == np.arange(len(seg_start))),
                verb_pos[fv_c], seg_start)
            root_of = root_seg[seg_id]
            # nearest following verb within the segment, else the root
            nv = np.searchsorted(verb_pos, p, side="right")
            nv_c = np.minimum(nv, len(verb_pos) - 1)
            nxt = np.where((nv < len(verb_pos))
                           & (seg_of_verb[nv_c] == seg_id),
                           verb_pos[nv_c], root_of)
        else:
            root_of = seg_start[seg_id]
            nxt = root_of

        pos_i = pos_col[inc]
        is_root = p == root_of
        is_noun = (pos_i == "NOUN") | (pos_i == "PROPN")
        not_first = ~boundary
        prev_adp = np.zeros(m, dtype=bool)
        prev_adp[1:] = pos_i[:-1] == "ADP"
        prev_adp &= not_first

        head_i = offs[inc][nxt]
        head_i[is_root] = offs[inc][is_root]
        punct = pos_i == "PUNCT"
        head_i[punct & ~is_root] = offs[inc][root_of[punct & ~is_root]]

        before_root = p < root_of
        dep_i = np.select(
            [is_root,
             is_noun & before_root,
             is_noun & prev_adp,
             is_noun & (pos_i == "NOUN"),
             is_noun,
             punct,
             pos_i == "DET",
             pos_i == "ADJ",
             pos_i == "ADP"],
            ["ROOT", "nsubj", "pobj", "obj", "appos", "punct", "det",
             "amod", "prep"],
            default="dep").astype(object)
        sub_i = ~is_root & (is_noun & (before_root | prev_adp))

        head_col[inc] = head_i
        dep_col[inc] = dep_i
        subobj_col[inc] = sub_i

    return {"pos": pos_col, "lemma_key": key_col, "label": label_col,
            "sent_id": sent_col, "head_offset": head_col,
            "dep_rel": dep_col, "sub_obj": subobj_col, "span_len": len_col}


class ExtractSpans:
    """documents(doc_id, spans) → one SPANS row per span occurrence."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        spans_list = batch.column("spans").combine_chunks()
        if isinstance(spans_list, pa.ChunkedArray):  # pragma: no cover
            spans_list = spans_list.combine_chunks()
        lengths = np.diff(spans_list.offsets.to_numpy(zero_copy_only=False))
        flat = spans_list.flatten()
        kind_arr = flat.field("kind")
        text_arr = flat.field("text")
        media_arr = flat.field("media_ref")
        off_arr = flat.field("offset")
        offs = off_arr.to_numpy(zero_copy_only=False).astype(np.int64)

        # factorize (kind, text) in C: join + dictionary-encode; only
        # the DISTINCT forms cross into Python
        dic = pc.dictionary_encode(
            pc.binary_join_element_wise(kind_arr, text_arr, "\x1f"))
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = dic.dictionary.to_pylist()

        def media_at(idxs: np.ndarray) -> list:
            return pc.take(media_arr,
                           pa.array(idxs, pa.int64())).to_pylist()

        derived = _analyze_from_codes(uniq, codes, media_at, offs, lengths)
        # doc_id repeated per span without a Python round-trip
        doc_id_rep = pc.take(batch.column("doc_id"),
                             pc.list_parent_indices(spans_list))
        return pa.Table.from_pydict({
            "doc_id": doc_id_rep,
            "offset": off_arr, "kind": kind_arr, "text": text_arr,
            "media_ref": media_arr,
            "lemma_key": derived["lemma_key"], "pos": derived["pos"],
            "label": derived["label"], "sent_id": derived["sent_id"],
            "head_offset": derived["head_offset"],
            "dep_rel": derived["dep_rel"], "sub_obj": derived["sub_obj"],
            "span_len": derived["span_len"],
        }, schema=SPANS)
