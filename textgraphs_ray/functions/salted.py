"""Salted two-stage aggregation for skewed keys.

A groupby over a hot key (one key holding 5% of 10^12 rows) lands that
key's entire volume on ONE reduce partition no matter how the shuffle
partitions keys.  The classic fix is salting: stage 1 groups on
``(key, salt)`` where salt spreads each key's rows over ``salt_width``
sub-groups (so the hot key's volume splits across reducers), stage 2
re-aggregates the ≤ ``salt_width`` partial rows per key — a second
shuffle whose input is keys·salt rows, not raw rows.

Only ALGEBRAIC aggregates compose this way (sum of sums, sum of
counts, min of mins, max of maxs) — exactly what this helper exposes.
The result is bit-identical to the unsalted groupby (oracle-checked),
so salting is purely a physical-plan choice.

The engine's other skew guards are structural (distinct-mention
combiners, blocking pair caps); this is the generic utility for
aggregations that can't pre-combine enough.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Max, Min, Sum


def salted_aggregate(ds: "ray.data.Dataset", key: str, *,
                     sums: tuple = (), count_alias: str | None = None,
                     mins: tuple = (), maxs: tuple = (),
                     salt_width: int = 16) -> "ray.data.Dataset":
    """Two-stage salted groupby: → one row per ``key`` with the
    requested aggregates (columns keep their names; the count column
    takes ``count_alias``)."""

    def add_salt(t: pa.Table) -> pa.Table:
        # block-local round-robin: spreads every key's rows uniformly
        # over salt_width sub-groups regardless of key skew
        salt = (np.arange(t.num_rows) % salt_width).astype(np.int32)
        return t.append_column("_salt", pa.array(salt))

    stage1_aggs = [Sum(c, alias_name=c) for c in sums]
    stage1_aggs += [Min(c, alias_name=c) for c in mins]
    stage1_aggs += [Max(c, alias_name=c) for c in maxs]
    if count_alias:
        stage1_aggs.append(Count(alias_name=count_alias))
    partial = (ds.map_batches(add_salt, batch_format="pyarrow")
               .groupby([key, "_salt"]).aggregate(*stage1_aggs))

    stage2_aggs = [Sum(c, alias_name=c) for c in sums]
    stage2_aggs += [Min(c, alias_name=c) for c in mins]
    stage2_aggs += [Max(c, alias_name=c) for c in maxs]
    if count_alias:
        # counts merge by summing the partial counts
        stage2_aggs.append(Sum(count_alias, alias_name=count_alias))
    return (partial.drop_columns(["_salt"])
            .groupby(key).aggregate(*stage2_aggs))
