"""Graph-element tables: node upsert and edge dedup as shuffles.

The reference maintains ``SimpleGraph.nodes``/``edges`` as in-process
upsert dicts (``/root/reference/textgraphs/graph.py:37-39``; upsert
``graph.py:53-164``, edge dedup ``graph.py:167-233``).  At 10^12 rows a
shared dict is impossible — exact dedup must be a shuffle (SURVEY.md
T6/J1/J2).  Each groupby here is preceded by a per-batch partial
aggregation (combiner) so the all-to-all exchange moves one row per
distinct key per batch, not one row per occurrence.

Divergences from the reference, by design (SURVEY.md §2.9 / H4):

- node ids are content hashes of the lemma key, not insertion order;
- "first occurrence wins" for representative text/pos becomes
  "min (kind-priority, doc_id, offset) wins" — deterministic under any
  execution order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..functions import kg
from ..schema import node_id_of
from .extract import analyze_spans

_KIND_PRIORITY = {"ent": 0, "iri": 1, "chu": 2, "lem": 3, "dep": 4, "media": 5}


def _preagg_nodes(batch: pa.Table) -> pd.DataFrame:
    """Per-batch combiner: one partial node row per distinct lemma_key."""
    df = batch.select(
        ["doc_id", "offset", "kind", "text", "lemma_key", "pos", "label",
         "sent_id", "sub_obj", "span_len"]
    ).to_pandas()
    df["_prio"] = df["kind"].map(_KIND_PRIORITY).fillna(9).astype(np.int8)
    df = df.sort_values(["lemma_key", "_prio", "doc_id", "offset"], kind="stable")
    g = df.groupby("lemma_key", sort=False)
    first = g.head(1).set_index("lemma_key")
    out = pd.DataFrame({
        "key": first.index,
        "text": first["text"].values,
        "pos": first["pos"].values,
        "kind": first["kind"].values,
        "label": first["label"].values,
        "length": first["span_len"].values.astype(np.int32),
        "sub_obj": g["sub_obj"].any().reindex(first.index).values,
        "count": g.size().reindex(first.index).values.astype(np.int64),
        "prio": first["_prio"].values,
        "min_doc": first["doc_id"].values,
        "min_off": first["offset"].values.astype(np.int32),
        "locs": g.apply(
            lambda s: list(zip(s["doc_id"], s["sent_id"], s["offset"])),
            include_groups=False,
        ).reindex(first.index).values,
    })
    return out.reset_index(drop=True)


def _merge_nodes(group: pd.DataFrame) -> pd.DataFrame:
    """Per-key reducer: merge partial rows into one node row."""
    group = group.sort_values(["prio", "min_doc", "min_off"], kind="stable")
    first = group.iloc[0]
    locs: list = []
    for part in group["locs"]:
        locs.extend(part)
    locs.sort()
    return pd.DataFrame({
        "key": [first["key"]],
        "node_id": node_id_of([first["key"]]),
        "text": [first["text"]],
        "pos": [first["pos"]],
        "kind": [first["kind"]],
        "label": [first["label"]],
        "length": [np.int32(first["length"])],
        "count": [np.int64(group["count"].sum())],
        "sub_obj": [bool(group["sub_obj"].any())],
        "neighbors": [np.int32(0)],
        "weight": [0.0],
        "locs": [[{"doc_id": d, "sent_id": int(s), "token_id": int(t)}
                  for d, s, t in locs]],
    })


def build_nodes(spans_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """SPANS rows → NODES table (reference ``make_node`` upsert,
    graph.py:53-164, as combiner + one hash shuffle on ``key``)."""
    partial = spans_ds.map_batches(_preagg_nodes, batch_format="pyarrow")
    return partial.groupby("key").map_groups(_merge_nodes, batch_format="pandas")


def extract_raw_edges(batch: pa.Table) -> pa.Table:
    """documents(doc_id, spans) → raw (pre-dedup) edge rows.

    Emits, per document (all intra-row — no shuffle):

    - dependency edges token → head (reference doc.py:440-459), self
      loops dropped (graph.py:220-221);
    - noun-chunk membership edges chu → member token (doc.py:362-378);
    - NER class links ent → NER_MAP IRI with rel ``rdf:type``
      (doc.py:242-306, M6/M7).
    """
    spans_list = batch.column("spans").combine_chunks()
    doc_ids = batch.column("doc_id").to_pylist()
    lengths = np.diff(spans_list.offsets.to_numpy(zero_copy_only=False))
    flat = spans_list.flatten()
    kinds = flat.field("kind").to_pylist()
    texts = flat.field("text").to_pylist()
    media = flat.field("media_ref").to_pylist()
    offs = flat.field("offset").to_pylist()

    src: list[str] = []
    dst: list[str] = []
    ekind: list[str] = []
    rel: list[str] = []
    prob: list[float] = []

    pos0 = 0
    for di, ln in enumerate(lengths):
        ln = int(ln)
        k = kinds[pos0:pos0 + ln]
        t = texts[pos0:pos0 + ln]
        m = media[pos0:pos0 + ln]
        o = offs[pos0:pos0 + ln]
        d = analyze_spans(k, t, m, o)
        keys = d["lemma_key"]
        by_offset = {o[i]: keys[i] for i in range(ln) if k[i] not in ("chu",)}
        for i in range(ln):
            if k[i] == "chu":
                # membership edges to covered token offsets
                for off in range(o[i], o[i] + d["span_len"][i]):
                    mk = by_offset.get(off)
                    if mk is not None and mk != keys[i]:
                        src.append(keys[i]); dst.append(mk)
                        ekind.append("chu"); rel.append("noun_chunk"); prob.append(1.0)
                continue
            if k[i] == "media":
                continue
            hk = by_offset.get(d["head_offset"][i])
            if hk is not None and hk != keys[i]:
                src.append(keys[i]); dst.append(hk)
                ekind.append("dep"); rel.append(d["dep_rel"][i]); prob.append(1.0)
            if k[i] == "ent":
                iri = kg.remap_ner(d["label"][i])
                if iri is not None:
                    src.append(keys[i]); dst.append(iri)
                    ekind.append("iri"); rel.append(kg.RDF_TYPE); prob.append(1.0)
        pos0 += ln
        _ = doc_ids[di]

    return pa.table({
        "src_key": pa.array(src, pa.string()),
        "dst_key": pa.array(dst, pa.string()),
        "kind": pa.array(ekind, pa.string()),
        "rel": pa.array(rel, pa.string()),
        "prob": pa.array(prob, pa.float64()),
    })


def _preagg_edges(batch: pa.Table) -> pa.Table:
    """Per-batch combiner for edge dedup: group on the composite key."""
    df = batch.to_pandas()
    g = df.groupby(["src_key", "dst_key", "kind", "rel"], sort=False, as_index=False)
    out = g.agg(prob=("prob", "max"), count=("prob", "size"))
    out["count"] = out["count"].astype(np.int64)
    out["edge_key"] = (out["src_key"] + "\x1f" + out["dst_key"] + "\x1f"
                       + out["rel"] + "\x1f" + out["kind"])
    return pa.Table.from_pandas(out, preserve_index=False)


def _merge_edges(group: pd.DataFrame) -> pd.DataFrame:
    first = group.iloc[0]
    return pd.DataFrame({
        "src_key": [first["src_key"]], "dst_key": [first["dst_key"]],
        "kind": [first["kind"]], "rel": [first["rel"]],
        "prob": [float(group["prob"].max())],
        "count": [np.int64(group["count"].sum())],
    })


def build_edges(raw_edges_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Raw edge rows → EDGES with counts (reference ``make_edge`` dedup,
    graph.py:167-233: identity = "{src}.{dst}.{rel}.{kind}",
    duplicate ⇒ count += 1)."""
    partial = raw_edges_ds.map_batches(_preagg_edges, batch_format="pyarrow")
    return partial.groupby("edge_key").map_groups(_merge_edges, batch_format="pandas")


def iri_nodes_from_edges(edges_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Distinct IRI class nodes referenced by rdf:type edges
    (reference ``_make_class_link`` dst nodes, doc.py:269-288)."""
    meta_by_iri = {m["iri"]: m for m in kg.NER_MAP.values()}

    def to_nodes(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df[df["kind"] == "iri"]
        g = df.groupby("dst_key", as_index=False)["count"].sum()
        metas = [meta_by_iri.get(i) for i in g["dst_key"]]
        return pd.DataFrame({
            "key": g["dst_key"],
            "node_id": node_id_of(list(g["dst_key"])),
            "text": [m["definition"] if m else "" for m in metas],
            "pos": kg.RDF_TYPE,
            "kind": "iri",
            "label": [m["label"] if m else "" for m in metas],
            "length": np.int32(1),
            "count": g["count"].astype(np.int64),
            "sub_obj": False,
            "neighbors": np.int32(0),
            "weight": 0.0,
            "locs": [[] for _ in metas],
        })

    return edges_ds.map_batches(to_nodes, batch_format="pyarrow")
