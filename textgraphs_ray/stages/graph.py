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
    df["_loc"] = list(zip(df["doc_id"], df["sent_id"], df["offset"]))
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
        "locs": g["_loc"].agg(list).reindex(first.index).values,
    })
    return out.reset_index(drop=True)


MERGE_PARTITIONS = 64


def _hash_part(values: np.ndarray, num_partitions: int) -> np.ndarray:
    """Deterministic vectorized hash partition of a string array."""
    return (pd.util.hash_array(values) % num_partitions).astype(np.int32)


def _merge_nodes_partition(g: pd.DataFrame) -> pd.DataFrame:
    """Coarse-partition reducer: merge ALL keys of one hash partition in
    one vectorized pandas groupby (never a one-row frame per key — at
    10^9 distinct keys the per-group frame overhead dominates)."""
    g = g.sort_values(["key", "prio", "min_doc", "min_off"], kind="stable")
    grp = g.groupby("key", sort=False)
    first = grp.head(1).set_index("key")
    keys = list(first.index)
    import itertools

    locs_merged = grp["locs"].agg(
        lambda parts: sorted(itertools.chain.from_iterable(parts)))
    return pd.DataFrame({
        "key": keys,
        "node_id": node_id_of(keys),
        "text": first["text"].values,
        "pos": first["pos"].values,
        "kind": first["kind"].values,
        "label": first["label"].values,
        "length": first["length"].values.astype(np.int32),
        "count": grp["count"].sum().reindex(first.index)
                 .values.astype(np.int64),
        "sub_obj": grp["sub_obj"].any().reindex(first.index)
                   .values.astype(bool),
        "neighbors": np.int32(0),
        "weight": 0.0,
        "locs": [[{"doc_id": d, "sent_id": int(s), "token_id": int(t)}
                  for d, s, t in v]
                 for v in locs_merged.reindex(first.index)],
    })


def build_nodes(spans_ds: "ray.data.Dataset", *,
                num_partitions: int = MERGE_PARTITIONS) -> "ray.data.Dataset":
    """SPANS rows → NODES table (reference ``make_node`` upsert,
    graph.py:53-164, as combiner + one hash shuffle).

    The shuffle groups on a coarse hash partition of ``key`` (not the
    key itself) so the reducer is one vectorized pandas groupby per
    partition; ``num_partitions`` bounds per-task group size — size it
    ≈ total distinct keys / (rows a worker can hold)."""

    def preagg(batch: pa.Table) -> pd.DataFrame:
        out = _preagg_nodes(batch)
        out["part"] = _hash_part(out["key"].to_numpy(object), num_partitions)
        return out

    partial = spans_ds.map_batches(preagg, batch_format="pyarrow")
    return partial.groupby("part").map_groups(
        _merge_nodes_partition, batch_format="pandas")


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


def _merge_edges_partition(g: pd.DataFrame) -> pd.DataFrame:
    """Coarse-partition reducer: one vectorized groupby-agg over every
    edge key in the partition."""
    out = g.groupby(["src_key", "dst_key", "kind", "rel"], sort=False,
                    as_index=False).agg(prob=("prob", "max"),
                                        count=("count", "sum"))
    out["prob"] = out["prob"].astype(np.float64)
    out["count"] = out["count"].astype(np.int64)
    return out


def build_edges(raw_edges_ds: "ray.data.Dataset", *,
                num_partitions: int = MERGE_PARTITIONS) -> "ray.data.Dataset":
    """Raw edge rows → EDGES with counts (reference ``make_edge`` dedup,
    graph.py:167-233: identity = "{src}.{dst}.{rel}.{kind}",
    duplicate ⇒ count += 1).  Same coarse-hash-partition shuffle as
    :func:`build_nodes` — the reducer never sees one group per key."""

    def preagg(batch: pa.Table) -> pa.Table:
        t = _preagg_edges(batch)
        part = _hash_part(np.asarray(t.column("edge_key").to_pylist(),
                                     dtype=object), num_partitions)
        return t.append_column("part", pa.array(part, pa.int32()))

    partial = raw_edges_ds.map_batches(preagg, batch_format="pyarrow")
    return partial.groupby("part").map_groups(
        _merge_edges_partition, batch_format="pandas")


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
