"""Incremental entity resolution: fold a delta corpus into existing
cluster state without rescoring history.

Web-scale corpora arrive as deltas (a day's crawl), not reruns.  The
batch chain (``pipelines/er.py``) would re-block and re-score the full
history each time; this variant keeps a tiny persistent state —
``mentions.parquet`` (distinct surface forms) and ``matches.parquet``
(accepted match edges) — and per delta:

1. extracts + dedups the delta's mentions (same combiner + groupby);
2. unions them with prior mentions and re-blocks the union (banding is
   cheap: O(distinct forms), no pair scoring);
3. drops candidate pairs where BOTH sides are prior mentions — those
   pairs were scored in an earlier run and their verdicts are already
   in ``matches.parquet``.  The membership test broadcasts the DELTA's
   new surface forms (small by construction) — "at least one side new"
   ≡ "not both prior" — and the new-key set itself comes from a
   semi-join streamed over the big prior table, so driver memory is
   O(delta) regardless of history size;
4. scores only the surviving (new×new, new×old) pairs;
5. unions new match edges with prior ones and re-runs transitive
   closure over the merged edge set (closure is cheap relative to
   scoring and must be global anyway — merges can bridge old
   clusters);
6. writes updated state back (atomic directory swap).

Invariant (tested): incremental resolution over any split of a corpus
produces exactly the clusters of one batch run over the whole corpus —
because blocking is deterministic per mention, old-old pairs are
already decided, and closure is associative.  Caveat: in buckets over
the skew cap the sorted-neighbor window re-pairs when membership
changes, so an old-old window pair that only materializes after new
members arrive is dropped unscored — the same candidate-loss class the
cap itself accepts; equality is exact for all uncapped buckets.

The reference has no incremental path (its engine is per-document and
in-memory); this is the S9/north-rule resume story extended to data
growth rather than failure recovery.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa

import ray
import ray.data

from ..stages.blocking import candidate_pairs
from ..stages.cluster import propagate_labels
from ..stages.scoring import score_pairs
from .er import extract_spans, mentions_from_spans

_MENTIONS = "mentions"
_MATCHES = "matches"


def _load_state(state_dir: str):
    """→ (mentions Dataset | None, matches Dataset | None).

    State is a parquet DIRECTORY per table (written shard-parallel by
    ``Dataset.write_parquet``); single-file legacy layouts read the
    same way since ``read_parquet`` accepts either."""
    mp = os.path.join(state_dir, _MENTIONS)
    xp = os.path.join(state_dir, _MATCHES)
    if not (os.path.exists(mp) and os.path.exists(xp)):
        return None, None
    return ray.data.read_parquet(mp), ray.data.read_parquet(xp)


def _write_state(state_dir: str, mentions: "ray.data.Dataset",
                 matches: "ray.data.Dataset") -> None:
    """Atomic state update: stream both tables to a sibling tmp dir
    (sharded parquet — never a driver-side collect; mentions is the
    full distinct-surface-form table and only ever exists as blocks),
    then swap directories."""
    tmp = state_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    mentions.write_parquet(os.path.join(tmp, _MENTIONS))
    matches.write_parquet(os.path.join(tmp, _MATCHES))
    old = state_dir + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(state_dir):
        os.rename(state_dir, old)
    os.rename(tmp, state_dir)
    shutil.rmtree(old, ignore_errors=True)


def resolve_entities_incremental(delta_docs: "ray.data.Dataset",
                                 state_dir: str, *,
                                 assets: pa.Table | None = None,
                                 num_partitions: int = 8,
                                 concurrency=None,
                                 kinds: tuple = ("ent", "media")) -> dict:
    """Fold ``delta_docs`` into the ER state under ``state_dir``.

    Returns {"clusters": Dataset over ALL known mentions, "mentions":
    ..., "new_matches": ..., "scored_pairs_dropped": int}.
    """
    prior_mentions, prior_matches = _load_state(state_dir)

    spans = extract_spans(delta_docs, concurrency=concurrency)
    assets_ref = ray.put(assets) if assets is not None else None
    delta_mentions = mentions_from_spans(spans, assets_ref, kinds=kinds)

    delta_mentions = delta_mentions.materialize()
    # distinct surface forms in the DELTA — bounded by delta size, the
    # small side by construction
    delta_keys = {r["key"] for r in delta_mentions.select_columns(
        ["key"]).take_all()}

    if prior_mentions is None:
        all_mentions = delta_mentions
        new_keys = delta_keys
    else:
        from ray.data.aggregate import Min, Sum

        all_mentions = (delta_mentions
                        .union(prior_mentions)
                        .groupby("key")
                        .aggregate(Min("text", alias_name="text"),
                                   Min("media_ref", alias_name="media_ref"),
                                   Min("kind", alias_name="kind"),
                                   Sum("n_mentions",
                                       alias_name="n_mentions"))
                        .materialize())
        # semi-join streamed over the BIG side: which delta keys already
        # exist in history (driver memory stays O(delta) throughout —
        # the unbounded prior-key set never leaves the cluster)
        dk_arr = pa.array(sorted(delta_keys), pa.string())
        dk_ref = ray.put(dk_arr)

        def overlap(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            hit = pc.is_in(t.column("key"), value_set=ray.get(dk_ref))
            return pa.table({"key": t.column("key").filter(hit)})

        seen = {r["key"] for r in prior_mentions
                .map_batches(overlap, batch_format="pyarrow").take_all()}
        new_keys = delta_keys - seen

    # a pair needs (re)scoring iff AT LEAST ONE side is a NEW surface
    # form — equivalent to "not both prior", but the broadcast side is
    # the delta's new keys (grows with the delta, NOT with 10^12-doc
    # history), so this stays a cheap ray.put at any corpus size
    nk_ref = ray.put(pa.array(sorted(new_keys), pa.string()))

    def keep_fresh(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        nk = ray.get(nk_ref)
        fresh = pc.or_(pc.is_in(t.column("key_a"), value_set=nk),
                       pc.is_in(t.column("key_b"), value_set=nk))
        return t.filter(fresh)

    pairs = candidate_pairs(all_mentions, concurrency=concurrency)
    fresh_pairs = pairs.map_batches(keep_fresh, batch_format="pyarrow")
    new_matches = score_pairs(fresh_pairs,
                              concurrency=concurrency).materialize()

    if prior_matches is not None and prior_matches.count():
        closure_edges = new_matches.union(prior_matches)
    else:
        closure_edges = new_matches

    clusters = propagate_labels(all_mentions, closure_edges,
                                num_partitions=num_partitions)

    # persist updated state (distinct match edges keep state bounded);
    # both tables stream shard-parallel to parquet — no driver collect
    from ..stages.scoring import dedup_matches

    _write_state(state_dir, all_mentions,
                 dedup_matches(closure_edges).materialize())

    return {
        "clusters": clusters,
        "mentions": all_mentions,
        "new_matches": new_matches,
    }
