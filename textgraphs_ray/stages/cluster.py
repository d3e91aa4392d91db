"""Distributed transitive closure: iterative groupby-min label
propagation (SURVEY.md §2.7/H1; north_rule stage 4).

The reference never materializes entity clusters — it defers closure to
RDF tooling (``/root/reference/textgraphs/elem.py:11-14``).  Here it is
an explicit distributed union-find: every node starts with its own
label (its key — content-derived, so the result is independent of
execution order, H1); each round every node takes the min label over
its closed neighborhood; fixed point ⇔ connected components.

Physical plan per round: one carried-through shuffle join (adjacency ⨝
labels on the node key, via :func:`_shuffle_join` — Ray's native hash
join loses schema on empty shuffle partitions, so the join rides a
bounded hash-partition groupby instead) + one groupby-min, both
partitioned on the same key, no per-row Python.  Rounds needed =
O(log diameter).  The driver loop
stops on an order-free label-signature fixpoint and can checkpoint per
round (resumable closure, ``state/checkpoint.py``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Min

from ..functions.sketch import hash64


# The empty-partition-safe join now lives in stages/join.py as the
# public ``shuffle_join`` operator; the closure loop rides it with the
# same positional signature it always had.
from .join import shuffle_join as _shuffle_join  # noqa: E402


def _both_directions(batch: pa.Table) -> pa.Table:
    ka = batch.column("key_a").combine_chunks()
    kb = batch.column("key_b").combine_chunks()
    return pa.table({
        "node": pa.concat_arrays(
            [c for c in (ka.chunks if isinstance(ka, pa.ChunkedArray) else [ka])]
            + [c for c in (kb.chunks if isinstance(kb, pa.ChunkedArray) else [kb])]),
        "other": pa.concat_arrays(
            [c for c in (kb.chunks if isinstance(kb, pa.ChunkedArray) else [kb])]
            + [c for c in (ka.chunks if isinstance(ka, pa.ChunkedArray) else [ka])]),
    })


def _label_signature(labels_ds: "ray.data.Dataset") -> int:
    """Order-free XOR signature of the (node, label) assignment.

    Vectorized end to end: one Arrow cast + element-wise join builds
    the per-row "node\\x1flabel" keys in C++, one ``hash64`` call
    hashes the batch — no per-row Python in the closure loop (this
    runs every round of the flagship chain).  Only signature
    EQUALITY across rounds matters, so any deterministic per-row
    hash keeps the convergence check byte-identical."""

    def sig_batch(t: pa.Table) -> pa.Table:
        joined = pc.binary_join_element_wise(
            pc.cast(t.column("node"), pa.string()),
            pc.cast(t.column("label"), pa.string()), "\x1f")
        vals = hash64(joined.to_numpy(zero_copy_only=False))
        s = np.bitwise_xor.reduce(vals) if len(vals) else np.uint64(0)
        return pa.table({"sig": pa.array([int(s)], pa.uint64())})

    sig = 0
    for row in labels_ds.map_batches(sig_batch, batch_format="pyarrow").take_all():
        sig ^= int(row["sig"])
    return sig


def _driver_union_find(nodes_ds: "ray.data.Dataset",
                       edges_ds: "ray.data.Dataset",
                       checkpoint_fn,
                       max_edges: int = 2_000_000
                       ) -> "ray.data.Dataset":
    """Small-graph fast path: the edge set fits on the driver (bounded
    by ``driver_threshold``), so closure is a vectorized min-label
    propagation over factorized edge arrays; the component map
    broadcasts back via ``ray.put`` and labels apply in a single
    ``map_batches``.  Semantically identical to the distributed loop
    (min-label roots).  The per-edge Python union-find this replaces
    cost ~3 s serial at 10^6 edges — pure driver latency paid equally
    at every cluster size, i.e. straight off the scaling numerator."""
    import pandas as pd

    import ray

    from ..functions.bounded import assert_bounded

    # the propagate_labels plan selection already bounds this path,
    # but direct callers get the same loud guard by construction
    assert_bounded(edges_ds, max_edges,
                   "use propagate_labels' distributed loop "
                   "(driver_threshold=0) or raise max_edges")
    parts = [b.select(["key_a", "key_b"])
             for b in edges_ds.iter_batches(batch_format="pyarrow")
             if b.num_rows]
    resolved: dict[str, str] = {}
    if parts:
        edges = pa.concat_tables(parts)
        # sort=True: code order == string order, so min-code root is
        # the min-key root the distributed loop produces
        codes, uniq = pd.factorize(np.concatenate([
            edges.column("key_a").to_numpy(zero_copy_only=False),
            edges.column("key_b").to_numpy(zero_copy_only=False)]),
            sort=True)
        m = edges.num_rows
        # both directions: scatter-min a→b and b→a each round
        src = np.concatenate([codes[:m], codes[m:]])
        dst = np.concatenate([codes[m:], codes[:m]])
        lab = np.arange(len(uniq), dtype=np.int64)
        while True:
            before = lab.copy()
            # adjacency carries both directions, so one scatter-min
            # per round propagates symmetrically
            np.minimum.at(lab, dst, lab[src])
            while True:  # pointer-jump to fixpoint: label <- label(label)
                nxt = lab[lab]
                if np.array_equal(nxt, lab):
                    break
                lab = nxt
            if np.array_equal(before, lab):
                break
        hit = np.nonzero(lab != np.arange(len(uniq)))[0]
        resolved = dict(zip(uniq[hit], uniq[lab[hit]]))
    ref = ray.put(resolved)

    def apply(t: pa.Table) -> pa.Table:
        lookup = ray.get(ref)
        keys = t.column("key").to_pylist()
        return pa.table({
            "key": t.column("key"),
            "cluster_id": pa.array([lookup.get(k, k) for k in keys],
                                   pa.string()),
        })

    out = nodes_ds.map_batches(apply, batch_format="pyarrow")
    if checkpoint_fn is not None:
        checkpoint_fn(0, out.map_batches(
            lambda t: pa.table({"node": t.column("key"),
                                "label": t.column("cluster_id")}),
            batch_format="pyarrow"))
    return out


def propagate_labels(nodes_ds: "ray.data.Dataset",
                     edges_ds: "ray.data.Dataset",
                     *,
                     max_rounds: int = 25,
                     num_partitions: int = 16,
                     checkpoint_fn=None,
                     driver_threshold: int = 2_000_000) -> "ray.data.Dataset":
    """Return ``clusters(key, cluster_id)`` for the connected components
    of ``edges_ds`` over the universe ``nodes_ds``.

    ``nodes_ds`` needs a distinct ``key`` column; ``edges_ds`` needs
    ``key_a``/``key_b``.  ``checkpoint_fn(round_idx, labels_ds)`` is
    invoked per round when provided.

    Edge sets at or below ``driver_threshold`` rows take the
    driver-side union-find fast path (the match-edge stream after
    blocking+scoring is tiny relative to the corpus; a provably-small
    candidate set on the driver beats O(log d) distributed rounds of
    fixed shuffle overhead).  Above it, the iterative
    join + groupby-min + pointer-jump loop runs fully distributed —
    that is the 10^12-row path; pass ``driver_threshold=0`` to force it.
    """
    # Pin the edge stream ONCE before counting: edges_ds is usually a
    # LAZY pair pipeline (banding → shuffle → verify), and both closure
    # paths read it again after count() — driver union-find via
    # iter_batches, the distributed loop via the adjacency map.
    # Without pinning, the entire upstream pair generation executes
    # twice (measured: 2× ~3 s at bench scale — the whole
    # dedup_minhash regression).  The edge list is dup-rate-bounded
    # (ids only, payloads never reach closure), so the pin is cheap at
    # any scale and spills like any other blocks.
    edges_ds = edges_ds.materialize()
    n_edges = edges_ds.count()
    if n_edges == 0:
        return nodes_ds.map_batches(
            lambda t: pa.table({"key": t.column("key"),
                                "cluster_id": t.column("key")}),
            batch_format="pyarrow",
        )
    if 2 * n_edges <= driver_threshold:
        # the driver path builds both directions in numpy — never pay
        # the distributed adjacency map + materialize + count for it
        return _driver_union_find(
            nodes_ds.map_batches(
                lambda t: pa.table({"key": t.column("key")}),
                batch_format="pyarrow"),
            edges_ds, checkpoint_fn, max_edges=driver_threshold)

    adjacency = edges_ds.map_batches(
        _both_directions, batch_format="pyarrow"
    ).materialize()  # reused every round — pin once in the object store

    # only the distributed loop needs the pinned label table — the
    # paths above never read it, so don't pay its materialization there
    labels = nodes_ds.map_batches(
        lambda t: pa.table({"node": t.column("key"), "label": t.column("key")}),
        batch_format="pyarrow",
    ).materialize()
    prev_sig = _label_signature(labels)
    for rnd in range(max_rounds):
        # neighbor step: every node takes the min label over its closed
        # neighborhood (one carried-through shuffle join + groupby-min)
        msgs = _shuffle_join(
            adjacency, labels, "node", "node", num_partitions,
            lambda m: m[["other", "label"]].rename(
                columns={"other": "node"}))
        # materialize: the pointer-jump join below reads this twice
        # (as its left side and as the mapping) — without pinning, the
        # whole neighbor step would re-execute once per side.  The
        # repartition bounds the per-round block count: union + groupby
        # otherwise emit O(input blocks) blocks, compounding each round
        # into thousands of micro-tasks.
        new_labels = labels.union(msgs).groupby("node").aggregate(
            Min("label", alias_name="label")
        ).repartition(num_partitions).materialize()

        # pointer-jump step: label ← label(label).  Labels are node
        # keys, so the labeling doubles as its own lookup table; each
        # jump halves chain depth ⇒ O(log diameter) rounds total
        # instead of O(diameter) for pure neighbor propagation.
        mapping = new_labels.map_batches(
            lambda t: pa.table({"jnode": t.column("node"),
                                "jlabel": t.column("label")}),
            batch_format="pyarrow",
        )
        new_labels = _shuffle_join(
            new_labels, mapping, "label", "jnode", num_partitions,
            lambda m: m[["node", "jlabel"]].rename(
                columns={"jlabel": "label"}),
        ).repartition(num_partitions).materialize()

        sig = _label_signature(new_labels)
        labels = new_labels
        if checkpoint_fn is not None:
            checkpoint_fn(rnd, labels)
        if sig == prev_sig:
            break
        prev_sig = sig

    return labels.map_batches(
        lambda t: pa.table({"key": t.column("node"),
                            "cluster_id": t.column("label")}),
        batch_format="pyarrow",
    )


def golden_records(clusters_ds: "ray.data.Dataset",
                   spans_ds: "ray.data.Dataset", *,
                   num_partitions: int = 16) -> "ray.data.Dataset":
    """Survivorship: one canonical "golden record" per entity cluster
    (the master-data-management step after resolution) — the surface
    form with the highest occurrence count, ties to the
    lexicographically smallest text.

    → (cluster_id, canonical, n_keys, n_occurrences).

    Plan: span occurrences collapse to (key, text, n) in a combiner-fed
    groupby (one row per surface form, the usual hot-key guard);
    cluster labels attach via the empty-partition-safe
    :func:`..stages.join.shuffle_join` on key — the SAME key every ER
    stage shuffles on, so co-location carries over — then one
    groupby(cluster) argmax over the per-cluster surface table.
    """
    import pandas as _pd

    from ray.data.aggregate import Sum

    from .join import shuffle_join

    def count_surfaces(t: pa.Table) -> "pa.Table":
        df = _pd.DataFrame({
            "key": t.column("lemma_key").to_pylist(),
            "text": t.column("text").to_pylist()})
        agg = (df.groupby(["key", "text"], sort=False)
               .size().reset_index(name="n"))
        return pa.Table.from_pandas(agg, preserve_index=False)

    surfaces = (spans_ds.map_batches(count_surfaces,
                                     batch_format="pyarrow")
                .groupby(["key", "text"])
                .aggregate(Sum("n", alias_name="n")))

    labeled = shuffle_join(
        surfaces, clusters_ds, "key", "key", num_partitions,
        project=lambda m: _pd.DataFrame({
            "cluster_id": m["cluster_id"], "key": m["key_2"]
            if "key_2" in m.columns else m["key"],
            "text": m["text"], "n": m["n"]}))

    def survivor(g: "_pd.DataFrame") -> "_pd.DataFrame":
        g2 = g.sort_values(["n", "text"], ascending=[False, True],
                           kind="stable")
        return _pd.DataFrame({
            "cluster_id": g2["cluster_id"].iloc[:1].to_numpy(),
            "canonical": g2["text"].iloc[:1].to_numpy(),
            "n_keys": np.array([g["key"].nunique()], np.int64),
            "n_occurrences": np.array([int(g["n"].sum())], np.int64)})

    return labeled.groupby("cluster_id").map_groups(
        survivor, batch_format="pandas")
