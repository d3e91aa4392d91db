"""Distributed transitive closure: iterative groupby-min label
propagation (SURVEY.md §2.7/H1; north_rule stage 4).

The reference never materializes entity clusters — it defers closure to
RDF tooling (``/root/reference/textgraphs/elem.py:11-14``).  Here it is
an explicit distributed union-find: every node starts with its own
label (its key — content-derived, so the result is independent of
execution order, H1); each round every node takes the min label over
its closed neighborhood; fixed point ⇔ connected components.

Physical plan per round: one hash join (adjacency ⨝ labels on the node
key) + one groupby-min — both hash-partitioned on the same key, no
per-group Python.  Rounds needed = O(log diameter).  The driver loop
stops on an order-free label-signature fixpoint and can checkpoint per
round (resumable closure, ``state/checkpoint.py``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Min

from ..functions.sketch import hash64


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
    """Order-free XOR signature of the (node, label) assignment."""

    def sig_batch(t: pa.Table) -> pa.Table:
        vals = hash64([
            f"{n}\x1f{l}"
            for n, l in zip(t.column("node").to_pylist(),
                            t.column("label").to_pylist())
        ])
        s = np.bitwise_xor.reduce(vals) if len(vals) else np.uint64(0)
        return pa.table({"sig": pa.array([int(s)], pa.uint64())})

    sig = 0
    for row in labels_ds.map_batches(sig_batch, batch_format="pyarrow").take_all():
        sig ^= int(row["sig"])
    return sig


def _driver_union_find(nodes_ds: "ray.data.Dataset",
                       adjacency: "ray.data.Dataset",
                       checkpoint_fn) -> "ray.data.Dataset":
    """Small-graph fast path: the edge set fits on the driver (bounded
    by ``driver_threshold``), so closure is one streaming union-find
    pass; the component map broadcasts back via ``ray.put`` and labels
    apply in a single ``map_batches``.  Semantically identical to the
    distributed loop (min-label roots)."""
    import ray

    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for batch in adjacency.iter_batches(batch_format="pyarrow"):
        for a, b in zip(batch.column("node").to_pylist(),
                        batch.column("other").to_pylist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                # min-label root keeps determinism = distributed result
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb

    resolved = {k: find(k) for k in list(parent)}
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
    labels = nodes_ds.map_batches(
        lambda t: pa.table({"node": t.column("key"), "label": t.column("key")}),
        batch_format="pyarrow",
    ).materialize()

    adjacency = edges_ds.map_batches(
        _both_directions, batch_format="pyarrow"
    ).materialize()  # reused every round — pin once in the object store

    n_adj = adjacency.count()
    if n_adj == 0:
        return labels.map_batches(
            lambda t: pa.table({"key": t.column("node"),
                                "cluster_id": t.column("label")}),
            batch_format="pyarrow",
        )
    if n_adj <= driver_threshold:
        return _driver_union_find(
            nodes_ds.map_batches(
                lambda t: pa.table({"key": t.column("key")}),
                batch_format="pyarrow"),
            adjacency, checkpoint_fn)

    prev_sig = _label_signature(labels)
    for rnd in range(max_rounds):
        # neighbor step: every node takes the min label over its closed
        # neighborhood (one hash join + one groupby-min)
        msgs = adjacency.join(
            labels, join_type="inner", on=("node",),
            num_partitions=num_partitions,
        ).map_batches(
            lambda t: pa.table({"node": t.column("other"),
                                "label": t.column("label")}),
            batch_format="pyarrow",
        )
        new_labels = labels.union(msgs).groupby("node").aggregate(
            Min("label", alias_name="label")
        )

        # pointer-jump step: label ← label(label).  Labels are node
        # keys, so the labeling doubles as its own lookup table; each
        # jump halves chain depth ⇒ O(log diameter) rounds total
        # instead of O(diameter) for pure neighbor propagation.
        mapping = new_labels.map_batches(
            lambda t: pa.table({"jnode": t.column("node"),
                                "jlabel": t.column("label")}),
            batch_format="pyarrow",
        )
        new_labels = new_labels.join(
            mapping, join_type="inner", on=("label",), right_on=("jnode",),
            num_partitions=num_partitions,
        ).map_batches(
            lambda t: pa.table({"node": t.column("node"),
                                "label": t.column("jlabel")}),
            batch_format="pyarrow",
        ).materialize()

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
