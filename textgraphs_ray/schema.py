"""Canonical Arrow schemas for the Ray-Data-native textgraphs engine.

The input table shape comes from BASELINE.json ``input_hint``::

    documents(doc_id: string,
              spans: list<struct<kind: string, text: string,
                                 media_ref: string, offset: int32>>)

Downstream tables mirror the reference's in-memory dicts
(``/root/reference/textgraphs/graph.py:37-39`` nodes/edges OrderedDicts,
``elem.py:97-117`` Node, ``elem.py:207-217`` Edge) as columnar Arrow
schemas per SURVEY.md §1.3.  Node/edge identity is content-derived
(hash of the lemma key / edge key) instead of insertion order
(``graph.py:146``) so results are order-independent (SURVEY.md §2.9).
"""

from __future__ import annotations

import pyarrow as pa

# ``kind`` carries the NodeEnum decoder strings (reference
# ``elem.py:88-94``: dep/lem/ent/chu/iri) plus "media" for media spans.
SPAN_KINDS = ("dep", "lem", "ent", "chu", "iri", "media")

# RelEnum decoder strings (reference ``elem.py:198-204``).
REL_KINDS = ("dep", "chu", "inf", "syn", "iri")

SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)

DOCUMENTS = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# One row per extracted span occurrence (the exploded form of DOCUMENTS
# with derived linguistic columns).  ``lemma_key`` is the invariant node
# identity (reference ``pipe.py:273-311``); ``sent_id``/``token_id``
# reproduce the reference ``loc`` tuples (``graph.py:114-119``).
SPANS = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("offset", pa.int32()),
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("lemma_key", pa.string()),
        pa.field("pos", pa.string()),
        pa.field("label", pa.string()),
        pa.field("sent_id", pa.int32()),
        pa.field("head_offset", pa.int32()),
        pa.field("dep_rel", pa.string()),
        pa.field("sub_obj", pa.bool_()),
        pa.field("span_len", pa.int32()),
    ]
)

NODES = pa.schema(
    [
        pa.field("key", pa.string()),
        pa.field("node_id", pa.uint64()),
        pa.field("text", pa.string()),
        pa.field("pos", pa.string()),
        pa.field("kind", pa.string()),
        pa.field("label", pa.string()),
        pa.field("length", pa.int32()),
        pa.field("count", pa.int64()),
        pa.field("sub_obj", pa.bool_()),
        pa.field("neighbors", pa.int32()),
        pa.field("weight", pa.float64()),
        pa.field(
            "locs",
            pa.list_(
                pa.struct(
                    [
                        pa.field("doc_id", pa.string()),
                        pa.field("sent_id", pa.int32()),
                        pa.field("token_id", pa.int32()),
                    ]
                )
            ),
        ),
    ]
)

EDGES = pa.schema(
    [
        pa.field("src_key", pa.string()),
        pa.field("dst_key", pa.string()),
        pa.field("kind", pa.string()),
        pa.field("rel", pa.string()),
        pa.field("prob", pa.float64()),
        pa.field("count", pa.int64()),
    ]
)

CLUSTERS = pa.schema(
    [
        pa.field("key", pa.string()),
        pa.field("cluster_id", pa.string()),
    ]
)

MATCH_EDGES = pa.schema(
    [
        pa.field("key_a", pa.string()),
        pa.field("key_b", pa.string()),
        pa.field("score", pa.float64()),
        pa.field("method", pa.string()),
    ]
)

AFFINITY = pa.schema(
    [
        pa.field("rel_a", pa.int32()),
        pa.field("rel_b", pa.int32()),
        pa.field("score", pa.float64()),
    ]
)


def node_id_of(key_arr):
    """Content-derived node id: stable 64-bit hash of the lemma key.

    Replaces the reference's insertion-order ids (``graph.py:146``) so
    distributed, order-free execution yields identical ids.
    """
    import numpy as np

    out = np.empty(len(key_arr), dtype=np.uint64)
    for i, k in enumerate(key_arr):
        h = 0xCBF29CE484222325
        for ch in k.encode("utf-8"):
            h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        out[i] = h
    return out
