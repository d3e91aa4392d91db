"""Borůvka minimum spanning forest — the classic O(log n)-round
distributed MST (Borůvka 1926; the GHS/Pregel-style plan), built
entirely from this repo's existing exchange machinery: label joins
ride :func:`..stages.join.shuffle_join`, per-round component merging
rides the flagship transitive-closure stage
(:func:`..stages.cluster.propagate_labels`).

Determinism contract: edges carry the STRICT total order (w, u, v) —
weights need not be distinct; the lexicographic tie-break makes every
per-component argmin unique, and the resulting forest is exactly the
one Kruskal produces scanning edges in (w, u, v) order (both pick, in
every cut, the unique order-minimal crossing edge).  Tests pin that
equivalence against a brute Kruskal and networkx totals.

Per round:

1. Two hash-partitioned label joins decorate every edge with its
   endpoints' current components; intra-component edges drop.
2. Every component elects its order-minimal incident edge: a
   per-block combiner keeps one candidate per (component) per block
   (sort + first), then one tiny groupby resolves the global argmin —
   never a per-component task over raw edges.
3. Elected edges (deduped — both endpoints may elect the same edge)
   join the forest, and their (comp_u, comp_v) pairs form the merge
   graph; ``propagate_labels`` relabels every component to its merged
   cluster's min id, and one more join rewrites node labels.

Components at least halve per round, so rounds ≤ log2(n); each round
is a constant number of bounded-fanout exchanges — the 10^12-edge
shape.  No SQL oracle (MST is not expressible in the driver's oracle
dialect); correctness is pinned by the Kruskal-equivalence tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Count

from .cluster import propagate_labels
from .join import shuffle_join

_EDGE_SCHEMA = pa.schema([("u", pa.int64()), ("v", pa.int64()),
                          ("w", pa.int64())])


def boruvka_msf(edges: "ray.data.Dataset", *, u: str = "u",
                v: str = "v", w: str = "w", max_rounds: int = 40,
                num_partitions: int = 16) -> "ray.data.Dataset":
    """→ (u, v, w): the edges of the minimum spanning forest of the
    undirected weighted graph under the strict (w, u, v) order.
    ``edges`` distinct with ``u < v`` and int64 weights."""

    def norm(t: pa.Table) -> pa.Table:
        return pa.table({
            "u": t.column(u).cast(pa.int64()),
            "v": t.column(v).cast(pa.int64()),
            "w": t.column(w).cast(pa.int64())})

    cur = edges.map_batches(norm, batch_format="pyarrow").materialize()
    if cur.count() == 0:
        return ray.data.from_arrow(_EDGE_SCHEMA.empty_table())

    def nodes_of(t: pa.Table) -> pa.Table:
        n = np.unique(np.concatenate([
            t.column("u").to_numpy(zero_copy_only=False),
            t.column("v").to_numpy(zero_copy_only=False)]))
        return pa.table({"node": pa.array(n.astype(np.int64))})

    def init(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("node"),
                         "comp": t.column("node")})

    labels = (cur.map_batches(nodes_of, batch_format="pyarrow")
              .groupby("node").aggregate(Count(alias_name="_c"))
              .select_columns(["node"])
              .map_batches(init, batch_format="pyarrow").materialize())

    accepted: list = []
    for _ in range(max_rounds):
        lab_u = shuffle_join(
            cur, labels, "u", "node", num_partitions,
            project=lambda m: pd.DataFrame({
                "u": m["u"], "v": m["v"], "w": m["w"],
                "cu": m["comp"]}))
        inter = shuffle_join(
            lab_u, labels, "v", "node", num_partitions,
            project=lambda m: m[m["cu"] != m["comp"]].rename(
                columns={"comp": "cv"})
            [["u", "v", "w", "cu", "cv"]]).materialize()
        if inter.count() == 0:
            break

        def double(t: pa.Table) -> pa.Table:
            return pa.concat_tables([
                pa.table({"comp": t.column("cu"), "u": t.column("u"),
                          "v": t.column("v"), "w": t.column("w"),
                          "cu": t.column("cu"),
                          "cv": t.column("cv")}),
                pa.table({"comp": t.column("cv"), "u": t.column("u"),
                          "v": t.column("v"), "w": t.column("w"),
                          "cu": t.column("cu"),
                          "cv": t.column("cv")})])

        def local_min(t: pa.Table) -> pa.Table:
            # combiner: one order-minimal candidate per component per
            # block — the global groupby only ever sees these
            df = (t.to_pandas()
                  .sort_values(["comp", "w", "u", "v"], kind="stable")
                  .drop_duplicates("comp", keep="first"))
            return pa.Table.from_pandas(df, preserve_index=False)

        def pick(g: pd.DataFrame) -> pa.Table:
            g = g.sort_values(["w", "u", "v"], kind="stable").head(1)
            return pa.Table.from_pandas(g, preserve_index=False)

        elected = (inter.map_batches(double, batch_format="pyarrow")
                   .map_batches(local_min, batch_format="pyarrow")
                   .groupby("comp").map_groups(pick,
                                               batch_format="pandas"))
        # both endpoints can elect the same edge — the two rows are
        # identical apart from the electing comp, so dedup with a
        # groupby-first after stripping that column
        def strip(t: pa.Table) -> pa.Table:
            return pa.table({"u": t.column("u"), "v": t.column("v"),
                             "w": t.column("w"), "cu": t.column("cu"),
                             "cv": t.column("cv")})

        def first(g: pd.DataFrame) -> pa.Table:
            return pa.Table.from_pandas(g.head(1),
                                        preserve_index=False)

        sel = (elected.map_batches(strip, batch_format="pyarrow")
               .groupby(["u", "v"]).map_groups(first,
                                               batch_format="pandas")
               .materialize())
        accepted.append(sel.select_columns(["u", "v", "w"]))

        # merge components: min-label closure over the elected
        # (cu, cv) pairs, then rewrite node labels through the map.
        # propagate_labels keys are strings — zero-padded 20-digit
        # ids keep lexicographic min ≡ numeric min (the grid-DBSCAN
        # precedent); non-negative comp ids by construction
        def comp_nodes(t: pa.Table) -> pa.Table:
            n = np.unique(np.concatenate([
                t.column("cu").to_numpy(zero_copy_only=False),
                t.column("cv").to_numpy(zero_copy_only=False)]))
            return pa.table({"key": pa.array(
                [f"{int(x):020d}" for x in n], pa.string())})

        def comp_edges(t: pa.Table) -> pa.Table:
            a = t.column("cu").to_numpy(zero_copy_only=False)
            b = t.column("cv").to_numpy(zero_copy_only=False)
            return pa.table({
                "key_a": pa.array([f"{int(x):020d}" for x in a],
                                  pa.string()),
                "key_b": pa.array([f"{int(x):020d}" for x in b],
                                  pa.string())})

        cnodes = (sel.map_batches(comp_nodes, batch_format="pyarrow")
                  .groupby("key").aggregate(Count(alias_name="_c"))
                  .select_columns(["key"]))
        cmap = propagate_labels(
            cnodes, sel.map_batches(comp_edges,
                                    batch_format="pyarrow"),
            num_partitions=num_partitions)

        def unpad(t: pa.Table) -> pa.Table:
            return pa.table({
                "key": pa.array([int(x) for x in
                                 t.column("key").to_pylist()],
                                pa.int64()),
                "newc": pa.array([int(x) for x in
                                  t.column("cluster_id").to_pylist()],
                                 pa.int64())})

        labels = shuffle_join(
            labels, cmap.map_batches(unpad, batch_format="pyarrow"),
            "comp", "key", num_partitions,
            project=lambda m: pd.DataFrame({
                "node": m["node"],
                "comp": m["newc"].where(m["newc"].notna(),
                                        m["comp"]).astype(np.int64)}),
            how="left").repartition(num_partitions).materialize()
    else:
        # rounds exhausted: re-derive the inter-component census from
        # the FINAL labels — the last round may have finished the job
        lab_u = shuffle_join(
            cur, labels, "u", "node", num_partitions,
            project=lambda m: pd.DataFrame({
                "v": m["v"], "cu": m["comp"]}))
        left = shuffle_join(
            lab_u, labels, "v", "node", num_partitions,
            project=lambda m: m[m["cu"] != m["comp"]][["cu"]])
        if left.count() != 0:
            raise RuntimeError(
                f"boruvka_msf did not converge within {max_rounds} "
                f"rounds — components halve per round, so raise "
                f"max_rounds past log2(n)")

    out = ray.data.from_arrow(_EDGE_SCHEMA.empty_table())
    for a in accepted:
        out = out.union(a)
    return out
