"""One-to-one assignment over scored candidate pairs.

Entity resolution's last mile: after blocking + scoring produce a
weighted pair stream, many linkage tasks need each record matched to
AT MOST ONE counterpart (deduplicating two registries, part↔supplier
assignment, survivorship).  Two standard operators:

* :func:`mutual_best_pairs` — the reciprocal-top-1 filter: keep a
  pair iff it is the best-scoring incident pair of BOTH endpoints.
  One pass, no iteration; the classic high-precision linkage rule.
* :func:`greedy_weight_matching` — the sequential greedy matching:
  scan pairs by (weight DESC, u ASC, v ASC) and accept whenever both
  endpoints are still free.  1/2-approximation to maximum-weight
  matching (Avis 1983, public), and the deterministic assignment rule
  ER pipelines actually ship.  Computed either on the driver (exact
  scan over a bounded pair list) or as the parallel LOCALLY-DOMINANT
  fixpoint (Preis 1999, public): per round, every pair that is the
  best incident pair at both endpoints is accepted, its endpoints'
  other pairs drop out.  Under the strict total pair order above the
  fixpoint equals the sequential greedy — pinned by a parity test.

**Scale shape**: mutual-best is two shuffles — one groupby over the
doubled pair stream (per-batch combiner first, so the exchange moves
one row per (node, batch)), one count-2 groupby over per-node winner
rows.  No joins, no broadcast.  The greedy fixpoint repeats that per
round (O(log n) rounds on non-adversarial weights) and broadcasts
only each round's MATCHED node ids (monotonically consumed, round-
bounded like `triangle.maximal_independent_set`'s drop set — swap the
broadcast for an anti shuffle_join at web scale).

Reference anchor: the reference links each entity to at most one KG
node via best-score thresholding (`textgraphs/kg.py:700-760`
_link_kg_search semantics); these operators generalize that rule to
symmetric record-record linkage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Count


def _node_best(pairs: "ray.data.Dataset", *, u: str, v: str,
               w: str) -> "ray.data.Dataset":
    """→ (n, u, v, w): each node's best incident pair under the
    strict total order (w DESC, u ASC, v ASC).  Doubled stream →
    per-batch combiner (one candidate per node per batch) → one
    groupby argmax.  Arrow blocks throughout."""

    def doubled_best(t: pa.Table) -> pa.Table:
        a = t.column(u).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(v).to_numpy(zero_copy_only=False).astype(np.int64)
        ww = t.column(w).to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.concatenate([a, b])
        uu = np.concatenate([a, a])
        vv = np.concatenate([b, b])
        www = np.concatenate([ww, ww])
        # per-batch combiner: best (w desc, u asc, v asc) per node
        order = np.lexsort((vv, uu, -www, n))
        n, uu, vv, www = n[order], uu[order], vv[order], www[order]
        first = np.concatenate([[True], n[1:] != n[:-1]])
        return pa.table({"n": pa.array(n[first]),
                         "u": pa.array(uu[first]),
                         "v": pa.array(vv[first]),
                         "w": pa.array(www[first])})

    def argmax(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["w", "u", "v"],
                          ascending=[False, True, True])
        return pa.Table.from_pandas(g.head(1), preserve_index=False)

    return (pairs.map_batches(doubled_best, batch_format="pyarrow")
            .groupby("n").map_groups(argmax, batch_format="pandas"))


def mutual_best_pairs(pairs: "ray.data.Dataset", *, u: str = "u",
                      v: str = "v", w: str = "w"
                      ) -> "ray.data.Dataset":
    """→ (u, v, w): pairs that are the best incident pair of BOTH
    endpoints — the reciprocal-top-1 linkage filter.  A node's best
    row lands once per endpoint, so mutual pairs are exactly the
    (u, v, w) groups of size 2 among per-node winners."""
    best = _node_best(pairs, u=u, v=v, w=w)
    cnt = (best.select_columns(["u", "v", "w"])
           .groupby(["u", "v", "w"]).aggregate(Count(alias_name="c")))
    return (cnt.filter(expr="c == 2")
            .select_columns(["u", "v", "w"]))


def greedy_weight_matching(pairs: "ray.data.Dataset", *,
                           u: str = "u", v: str = "v", w: str = "w",
                           plan: str = "driver",
                           max_pairs: int = 5_000_000,
                           max_rounds: int = 50,
                           num_partitions: int = 16,
                           broadcast_max: int = 2_000_000
                           ) -> "ray.data.Dataset":
    """→ (u, v, w): the greedy 1-1 matching under (w DESC, u, v).

    ``plan="driver"``: exact sequential scan over a bounded collected
    pair list (guarded by ``max_pairs`` — the pair stream after
    blocking is presumed reduced; raise the bound consciously).
    ``plan="distributed"``: locally-dominant fixpoint — per round the
    mutual-best pairs are accepted and their endpoints retire; equals
    the driver scan under the strict total order (parity-pinned).
    ``broadcast_max`` bounds the per-round matched-set broadcast in
    the distributed plan (above it the set anti-joins as a Dataset —
    see :func:`_greedy_distributed`)."""
    if plan == "driver":
        return _greedy_driver(pairs, u=u, v=v, w=w,
                              max_pairs=max_pairs)
    if plan != "distributed":
        raise ValueError(f"plan must be 'driver' or 'distributed', "
                         f"got {plan!r}")
    return _greedy_distributed(pairs, u=u, v=v, w=w,
                               max_rounds=max_rounds,
                               num_partitions=num_partitions,
                               broadcast_max=broadcast_max)


def _matching_table(us, vs, ws) -> pa.Table:
    order = np.lexsort((vs, us))
    return pa.table({"u": pa.array(us[order]),
                     "v": pa.array(vs[order]),
                     "w": pa.array(ws[order])})


def _greedy_driver(pairs, *, u, v, w, max_pairs):
    from ..functions.bounded import collect_bounded

    rows = collect_bounded(
        pairs.select_columns([u, v, w]).materialize(), max_pairs,
        "the driver plan collects the pair list; use "
        "plan='distributed' or raise max_pairs")
    a = np.array([r[u] for r in rows], np.int64)
    b = np.array([r[v] for r in rows], np.int64)
    ww = np.array([r[w] for r in rows], np.int64)
    order = np.lexsort((b, a, -ww))
    matched: set[int] = set()
    keep_idx = []
    for i in order:
        x, y = int(a[i]), int(b[i])
        if x not in matched and y not in matched:
            matched.add(x)
            matched.add(y)
            keep_idx.append(i)
    ki = np.array(keep_idx, np.int64)
    return ray.data.from_arrow(_matching_table(a[ki], b[ki], ww[ki]))


def _greedy_distributed(pairs, *, u, v, w, max_rounds,
                        num_partitions,
                        broadcast_max: int = 2_000_000):
    """Locally-dominant fixpoint.  Each round's accepted mutual-best
    pairs stay a MATERIALIZED Dataset (never required on the driver):
    while a round accepts ≤ ``broadcast_max`` pairs the matched-node
    set collects and re-broadcasts via ``ray.put`` (one stateless
    scan); above the bound the matched endpoints become a ``(node,)``
    Dataset and survivors come from two anti ``shuffle_join``\\ s —
    the ``bfs_hops`` visited-set pattern, constant driver memory.
    The accepted sets accumulate as Datasets and union at the end
    (they are pairwise node-disjoint by construction), so the OUTPUT
    never collects either.  Both plans output-identical
    (parity-pinned)."""
    from .join import shuffle_join

    cur = (pairs.select_columns([u, v, w])
           .repartition(num_partitions).materialize())
    taken_sets: list = []

    for _ in range(max_rounds):
        if cur.count() == 0:
            break
        # non-empty whenever edges remain: the globally first pair
        # under the total order is mutual-best at both endpoints
        taken = (mutual_best_pairs(cur, u=u, v=v, w=w)
                 .repartition(num_partitions).materialize())
        n_taken = taken.count()
        taken_sets.append(taken)
        if n_taken <= broadcast_max:
            rows = taken.take_all()   # bounded by the branch test
            tu = np.array([r["u"] for r in rows], np.int64)
            tv = np.array([r["v"] for r in rows], np.int64)
            matched_ref = ray.put(np.union1d(tu, tv))

            def keep(t: pa.Table) -> pa.Table:
                bad = ray.get(matched_ref)
                a = t.column(u).to_numpy(zero_copy_only=False)
                b = t.column(v).to_numpy(zero_copy_only=False)
                m = ~(np.isin(a, bad) | np.isin(b, bad))
                return t.filter(pa.array(m))

            cur = cur.map_batches(keep, batch_format="pyarrow")
        else:
            def endpoints(t: pa.Table) -> pa.Table:
                a = t.column("u").to_numpy(zero_copy_only=False)
                b = t.column("v").to_numpy(zero_copy_only=False)
                return pa.table({"node": pa.array(
                    np.unique(np.concatenate([a, b]))
                    .astype(np.int64))})

            matched = taken.map_batches(endpoints,
                                        batch_format="pyarrow")
            cur = shuffle_join(cur, matched, u, "node",
                               num_partitions, how="anti")
            cur = shuffle_join(cur, matched, v, "node",
                               num_partitions, how="anti")
        cur = cur.repartition(num_partitions).materialize()
    if cur.count() > 0:
        raise RuntimeError(
            f"greedy_weight_matching did not converge in "
            f"{max_rounds} rounds ({cur.count()} pairs remain) — "
            f"raise max_rounds")
    out = ray.data.from_arrow(pa.schema(
        [("u", pa.int64()), ("v", pa.int64()),
         ("w", pa.int64())]).empty_table())
    for t in taken_sets:
        out = out.union(t)
    # rounds are node-disjoint, so a plain union + the driver plan's
    # (u, v) output order — no dedup shuffle needed
    return out.repartition(num_partitions).sort(["u", "v"])
