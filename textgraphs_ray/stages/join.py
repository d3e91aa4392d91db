"""Distributed join operators (SURVEY.md §2.4 J-family plumbing).

Two physical join plans, chosen by the size of the build side:

- :func:`shuffle_join` — both sides large: union + ONE coarse
  hash-partition sort shuffle + vectorized per-partition pandas merge.
  Ray's native hash JOIN loses its schema when a shuffle partition
  comes up empty (repo invariant, CLAUDE.md) — with sparse keys and
  high ``num_partitions`` a join crashes with "No match ... FieldRef".
  Carrying both sides through one bounded-fanout groupby sidesteps the
  empty-partition path entirely: ``map_groups`` only ever sees
  non-empty groups.  This is the join the distributed-closure loop and
  global PageRank ride every round (``cluster.py``, ``rank.py``).

- :func:`broadcast_join` — small build side: ``ray.put`` the build
  table ONCE, then a stateless vectorized ``pc.index_in``/``take``
  lookup inside ``map_batches`` over the probe side.  No shuffle at
  all; the pattern every dimension-table join at 100 TB should use
  (shipping a 25-row nation table through an all-to-all exchange is
  wrong at any scale).

Both preserve input streaming: no driver-side materialization of
either dataset (broadcast_join's build side is an in-memory Arrow
table by contract — the caller decides it is small).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def shuffle_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
                 left_on: str, right_on: str, num_partitions: int,
                 project=None, *, how: str = "inner") -> "ray.data.Dataset":
    """Join two large Datasets via union + coarse hash partition +
    per-partition pandas merge (empty-partition-safe; see module doc).

    ``project(merged_df) -> df`` selects/renames output columns
    (default: every column of both sides — including BOTH key columns
    when the names differ, pandas-merge semantics; pass a project to
    drop one).  ``how`` is ``"inner"`` or ``"left"``.  ``num_partitions`` bounds
    per-task group size — size it ≈ total rows / (rows a worker can
    merge in memory).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    lnames = list(left.schema().names)
    rnames = list(right.schema().names)
    allnames = lnames + [c for c in rnames if c not in lnames]

    def widen(names: list, key: str, side: int):
        def fn(t: pa.Table) -> pd.DataFrame:
            df = t.to_pandas()
            for c in allnames:
                if c not in df.columns:
                    df[c] = None
            df["_side"] = np.int8(side)
            df["_part"] = (pd.util.hash_array(df[key].to_numpy(object))
                           % num_partitions).astype(np.int32)
            return df[allnames + ["_side", "_part"]]
        return fn

    both = (left.map_batches(widen(lnames, left_on, 0),
                             batch_format="pyarrow")
            .union(right.map_batches(widen(rnames, right_on, 1),
                                     batch_format="pyarrow")))

    def merge(g: pd.DataFrame) -> pa.Table:
        lt = g[g["_side"] == 0][lnames]
        rt = g[g["_side"] == 1][rnames]
        if left_on == right_on:
            m = lt.merge(rt, on=left_on, how=how)
        else:
            m = lt.merge(rt, left_on=left_on, right_on=right_on,
                         how=how)
        out = project(m) if project is not None else m
        # emit Arrow so downstream union with arrow-block datasets
        # keeps one block type
        return pa.Table.from_pandas(out, preserve_index=False)

    return both.groupby("_part").map_groups(merge, batch_format="pandas")


def broadcast_join(probe: "ray.data.Dataset", build: pa.Table, *,
                   on: str, build_on: str | None = None,
                   how: str = "inner",
                   columns: list | None = None) -> "ray.data.Dataset":
    """Join a streaming probe Dataset against a SMALL in-memory build
    table: the build side ships to the object store once (``ray.put``)
    and every batch resolves matches with one vectorized
    ``pc.index_in`` + ``take`` — no shuffle, no per-row Python.

    ``columns`` limits which build columns are appended (default: all
    but the key; the key itself is never appended — pass ``[]`` for a
    pure semi-join that appends nothing).  ``how="left"`` keeps
    unmatched probe rows with null build columns; ``"inner"`` drops
    them.  Duplicate build keys keep the FIRST occurrence (dimension
    tables are unique-keyed by contract — assert upstream if unsure).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    bkey = build_on or on
    if columns is None:
        out_cols = [c for c in build.column_names if c != bkey]
    else:
        missing = [c for c in columns if c not in build.column_names]
        if missing:
            raise ValueError(f"columns not in build table: {missing}")
        out_cols = [c for c in columns if c != bkey]
    build = build.combine_chunks()
    b_ref = ray.put(build.select([bkey] + out_cols))

    def lookup(t: pa.Table) -> pa.Table:
        b = ray.get(b_ref)
        idx = pc.index_in(t.column(on), value_set=b.column(bkey))
        if how == "inner":
            keep = pc.is_valid(idx)
            t = t.filter(keep)
            idx = idx.filter(keep)
        for c in out_cols:
            t = t.append_column(c, pc.take(b.column(c), idx))
        return t

    return probe.map_batches(lookup, batch_format="pyarrow")
