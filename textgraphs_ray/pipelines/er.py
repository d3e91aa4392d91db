"""Flagship entity-resolution pipeline (north_rule stages 1-5).

    documents ──ExtractSpans──► spans ──build_nodes──► nodes
        │                                        │
        └─extract_raw_edges─► edges              ├─ ent/media mentions
                                                 ▼
      MinHash/LSH blocking ──► candidate pairs ──► PairScorer (actor pool)
                                                 ▼
      match edges ──► iterative groupby-min label propagation ──► clusters
                                                 ▼
                      per-cluster TextRank post-pass (stages/rank.py)

Everything is a Dataset transform; the only materialized intermediates
are the small reused ones (adjacency in the closure loop, node table
for ranking).  Reference lifecycle being reproduced: ``demo.py:43-220``
(parse → collect → link → infer → rank), re-expressed as streaming
batch stages per SURVEY.md §3.1.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

#: Coarse-partition fan-out for the global mention distinct (power of
#: two — the partition id is ``hash64(key) & (N-1)``).  64 partitions
#: keeps per-partition reduce work bounded while staying far below the
#: block count, so the groupby shuffle moves an int32 column.
MENTION_PARTITIONS = 64

from ..stages.blocking import candidate_pairs
from ..stages.cluster import propagate_labels
from ..stages.extract import ExtractSpans, Spanify
from ..stages.scoring import score_pairs


def extract_spans(docs_ds: "ray.data.Dataset", *,
                  concurrency=None, batch_size: int = 256) -> "ray.data.Dataset":
    # ExtractSpans holds no model state → task-based map (no actor
    # pool ramp-up; work-stealing across the whole cluster).  The
    # concurrency arg is accepted for API symmetry but tasks autoscale.
    del concurrency
    return docs_ds.map_batches(ExtractSpans(), batch_format="pyarrow",
                               batch_size=batch_size)


def spanify_text(docs_ds: "ray.data.Dataset", *, text_col: str = "text",
                 id_col: str = "doc_id", concurrency=None,
                 batch_size: int = 256) -> "ray.data.Dataset":
    kwargs = {"batch_format": "pyarrow", "batch_size": batch_size,
              "fn_constructor_kwargs": {"text_col": text_col, "id_col": id_col},
              "concurrency": concurrency or (1, 4)}
    return docs_ds.map_batches(Spanify, **kwargs)


def mentions_from_spans(spans_ds: "ray.data.Dataset",
                        assets_ref=None,
                        kinds: tuple = ("ent", "media")) -> "ray.data.Dataset":
    """SPANS rows → distinct mention table (key, text).

    Text mentions: ``ent`` spans keyed by lemma key.  Media mentions:
    ``media`` spans keyed by ``media:<ref>`` whose text is the decoded
    payload (deterministic decode STUB, ``stages/encode.py``); absent
    an asset store they block only on exact ref equality.

    Distinctness comes from a groupby on ``key`` — this is the skew
    guard: a hot surface form is one blocking row regardless of its
    occurrence count.
    """

    def project(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column("kind"), value_set=pa.array(list(kinds)))
        t = batch.filter(mask)
        # partial per-batch dedup (combiner): the mention shuffle moves
        # one row per distinct key per block, not one per occurrence —
        # at web scale this is the difference between shuffling 10^12
        # span rows and ~10^9 distinct surface forms
        part = pa.table({
            "key": t.column("lemma_key"),
            "text": t.column("text"),
            "media_ref": t.column("media_ref"),
            "kind": t.column("kind"),
        }).group_by("key").aggregate([
            ("text", "min"), ("media_ref", "min"), ("kind", "min"),
            ("key", "count")])
        return part.rename_columns(
            ["key", "text", "media_ref", "kind", "n"])

    mentions = spans_ds.map_batches(project, batch_format="pyarrow")

    # Global distinct-by-key via a COARSE hash partition (int32 key)
    # plus one vectorized Arrow group_by per partition — the same
    # pattern as blocking's _pairs_for_partition.  Ray's native
    # groupby(key).aggregate sorts the string keys and accumulates
    # per row in Python (measured 21 s CPU on a 49 k-row stream, ~30×
    # the extract cost); this shuffles the cheap int key instead and
    # keeps the reduce one C call per partition.
    from ..functions.sketch import hash64

    def add_part(t: pa.Table) -> pa.Table:
        part = (hash64(t.column("key").to_pylist())
                & np.uint64(MENTION_PARTITIONS - 1)).astype(np.int32)
        return t.append_column("part", pa.array(part))

    def reduce_part(t: pa.Table) -> pa.Table:
        agg = t.drop_columns(["part"]).group_by("key").aggregate(
            [("text", "min"), ("media_ref", "min"), ("kind", "min"),
             ("n", "sum")])
        return agg.rename_columns(
            ["key", "text", "media_ref", "kind", "n_mentions"]
        ).select(["key", "text", "media_ref", "kind", "n_mentions"])

    # Coalesce the per-block partials (narrow repartition, NO
    # all-to-all: shuffle=False splits/merges blocks in place) before
    # the groupby: the sort-shuffle's ORCHESTRATION cost scales with
    # its input block count (measured 1.6 s at 16 input blocks vs
    # 3.9-8.6 s at 64 for the identical 50k-row partial stream), and
    # the combiner has already shrunk the stream to
    # distinct-keys-per-block rows, so wide inputs only buy sort
    # overhead.  The target rides MENTION_PARTITIONS — the documented
    # knob that grows with the distinct-key universe — so a bigger
    # deployment raises both together.
    distinct = (mentions.map_batches(add_part, batch_format="pyarrow")
                .repartition(max(8, MENTION_PARTITIONS // 4))
                .groupby("part")
                .map_groups(reduce_part, batch_format="pyarrow"))

    if assets_ref is not None:
        from ..stages.encode import MediaDecodeStub

        def decode_media(cls_batch: pa.Table, lookup: dict) -> pa.Table:
            kinds = cls_batch.column("kind").to_pylist()
            refs = cls_batch.column("media_ref").to_pylist()
            texts = cls_batch.column("text").to_pylist()
            out = [lookup.get(r, "") if k == "media" else t
                   for k, r, t in zip(kinds, refs, texts)]
            return cls_batch.set_column(
                cls_batch.schema.get_field_index("text"), "text",
                pa.array(out, pa.string()))

        class _Decoder(MediaDecodeStub):
            def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
                return decode_media(batch, self.lookup)

        distinct = distinct.map_batches(
            _Decoder, batch_format="pyarrow", concurrency=(1, 8),
            fn_constructor_args=(assets_ref,))
    return distinct


def resolve_entities(docs_ds: "ray.data.Dataset", *,
                     assets: pa.Table | None = None,
                     num_partitions: int = 16,
                     concurrency=None,
                     checkpoint_fn=None,
                     kinds: tuple = ("ent", "media")) -> dict:
    """Run extract → block → score → cluster; return the dict of
    result Datasets (lazy where possible).

    ``kinds`` selects which span kinds become mentions; pass
    ``("ent", "media", "lem")`` to resolve at the lemma-key level
    (the reference's J1 node-upsert granularity, graph.py:134-157)
    on corpora without named entities."""
    spans = extract_spans(docs_ds, concurrency=concurrency)
    assets_ref = ray.put(assets) if assets is not None else None
    mentions = mentions_from_spans(spans, assets_ref,
                                   kinds=kinds).materialize()
    pairs = candidate_pairs(mentions, concurrency=concurrency)
    # NOTE: match edges are NOT pair-deduped here — transitive closure
    # is duplicate-insensitive and the accepted-edge stream is small,
    # so skipping dedup_matches saves a full sort shuffle; callers who
    # need distinct edges (accounting, exports) apply
    # scoring.dedup_matches themselves.
    matches = score_pairs(pairs, concurrency=concurrency).materialize()
    clusters = propagate_labels(
        mentions, matches, num_partitions=num_partitions,
        checkpoint_fn=checkpoint_fn)
    return {
        "spans": spans,
        "mentions": mentions,
        "match_edges": matches,
        "clusters": clusters,
    }
