"""Ranked-phrase extraction pipeline (reference lifecycle steps 2-8,
``/root/reference/textgraphs/demo.py:74-170``; SURVEY.md §3.1).

documents → spans → per-document node/edge projections → per-partition
TextRank + restack (stages/rank.py) → ranked phrases table
(reference ``get_phrases_as_df``, doc.py:973-984; S8/O1).

Partitioning: the lemma graph is never global.  Ranking groups by
``doc_id`` (document-local graphs, matching the reference's
one-document demos); entity-cluster partitioning is the scale path for
cross-document ranking (north_rule's per-cluster TextRank post-pass).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Max, Min

from ..functions import kg
from ..stages.extract import analyze_spans
from ..stages.rank import rank_partitions


def doc_nodes(spans_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """SPANS → per-(doc, key) node rows (part=doc_id)."""

    def preagg(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(["doc_id", "lemma_key", "kind", "text", "pos",
                           "label", "sub_obj"]).to_pandas()
        g = df.groupby(["doc_id", "lemma_key"], sort=False, as_index=False).agg(
            kind=("kind", "first"), text=("text", "first"),
            pos=("pos", "first"), label=("label", "first"),
            sub_obj=("sub_obj", "any"), count=("kind", "size"))
        g = g.rename(columns={"doc_id": "part", "lemma_key": "key"})
        g["count"] = g["count"].astype(np.int64)
        return g

    partial = spans_ds.map_batches(preagg, batch_format="pyarrow")
    # batches hold whole documents (ExtractSpans emits per-doc), so the
    # per-batch combiner is already exact per (doc, key); a groupby
    # would only be needed if a document spanned batches
    return partial.groupby(["part", "key"]).aggregate(
        Min("kind", alias_name="kind"), Min("text", alias_name="text"),
        Min("pos", alias_name="pos"), Min("label", alias_name="label"),
        Max("sub_obj", alias_name="sub_obj"), Count(alias_name="n_parts"),
    ).map_batches(
        lambda t: t.drop_columns(["n_parts"]).append_column(
            "count", t.column("n_parts")),
        batch_format="pyarrow",
    )


def doc_edges(docs_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """documents → per-doc edge rows tagged with part=doc_id (dep + chu
    edges; intra-row, no shuffle)."""

    def emit(batch: pa.Table) -> pa.Table:
        spans_list = batch.column("spans").combine_chunks()
        doc_ids = batch.column("doc_id").to_pylist()
        lengths = np.diff(spans_list.offsets.to_numpy(zero_copy_only=False))
        flat = spans_list.flatten()
        kinds = flat.field("kind").to_pylist()
        texts = flat.field("text").to_pylist()
        media = flat.field("media_ref").to_pylist()
        offs = flat.field("offset").to_pylist()
        part, src, dst = [], [], []
        pos0 = 0
        for di, ln in enumerate(lengths):
            ln = int(ln)
            k = kinds[pos0:pos0 + ln]
            d = analyze_spans(k, texts[pos0:pos0 + ln],
                              media[pos0:pos0 + ln], offs[pos0:pos0 + ln])
            keys = d["lemma_key"]
            o = offs[pos0:pos0 + ln]
            by_offset = {o[i]: keys[i] for i in range(ln) if k[i] != "chu"}
            for i in range(ln):
                if k[i] == "media":
                    continue
                if k[i] == "chu":
                    for off in range(o[i], o[i] + d["span_len"][i]):
                        mk = by_offset.get(off)
                        if mk is not None and mk != keys[i]:
                            part.append(doc_ids[di])
                            src.append(keys[i]); dst.append(mk)
                    continue
                hk = by_offset.get(d["head_offset"][i])
                if hk is not None and hk != keys[i]:
                    part.append(doc_ids[di])
                    src.append(keys[i]); dst.append(hk)
            pos0 += ln
        return pa.table({
            "part": pa.array(part, pa.string()),
            "src_key": pa.array(src, pa.string()),
            "dst_key": pa.array(dst, pa.string()),
        })

    return docs_ds.map_batches(emit, batch_format="pyarrow")


def ranked_phrases(docs_ds: "ray.data.Dataset",
                   spans_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-document ranked phrases: (part, key, text, pos, label, count,
    weight), weight>0 only, sorted desc by weight (doc.py:940-959)."""
    nodes = doc_nodes(spans_ds).materialize()
    edges = doc_edges(docs_ds)
    # rank_partitions carries the node attribute columns through its
    # one partition shuffle, so no attribute join is needed here
    joined = rank_partitions(nodes, edges)

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = t.filter(pc.greater(t.column("weight"), 0.0))
        # OntoTypes4 → IRI → prefixed form, like the reference's
        # remap_ner + normalize_prefix chain (M6/M9)
        labels = []
        for l, kd in zip(t.column("label").to_pylist(),
                         t.column("kind").to_pylist()):
            if kd == "ent" and l:
                iri = kg.remap_ner(l)
                labels.append(kg.normalize_prefix(iri) if iri else l)
            else:
                labels.append(l)
        t = t.set_column(t.schema.get_field_index("label"), "label",
                         pa.array(labels, pa.string()))
        return t

    return (joined.map_batches(finish, batch_format="pyarrow")
            .sort("weight", descending=True))
