"""Resumable partitioned sink (task charter: "write partitioned
Parquet — one directory per input shard / key range — so a failed run
can skip finished partitions; never one giant file").

``write_partitioned_resumable`` writes one ``<col>=<value>/`` directory
per partition key with a ``_SUCCESS`` marker per completed partition:

1. partitions already marked complete are FILTERED OUT of the dataset
   before any write (a broadcast ``pc.is_in`` — no shuffle, and the
   skipped partitions' rows are never recomputed downstream of a lazy
   pipeline);
2. unmarked partial directories from a crashed run are deleted first
   (write_parquet appends — stale half-written files must not merge
   with the rerun);
3. markers are written only after the write returns, so a crash at any
   point leaves either a complete marked partition or a removable
   unmarked one — rerunning converges.

Complements ``state/checkpoint.py`` (whole-stage manifests): this is
the OUTPUT-side resume, per key-range, matching the north rule's
per-partition lineage.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_MARKER = "_SUCCESS"


def completed_partitions(root: str, partition_col: str) -> set:
    """→ set of partition VALUES (strings) already marked complete."""
    done = set()
    if not os.path.isdir(root):
        return done
    prefix = partition_col + "="
    for d in os.listdir(root):
        if d.startswith(prefix) and os.path.exists(
                os.path.join(root, d, _MARKER)):
            done.add(d[len(prefix):])
    return done


def write_partitioned_resumable(ds: "ray.data.Dataset", root: str,
                                partition_col: str) -> dict:
    """Write ``ds`` under ``root`` partitioned by ``partition_col``,
    skipping partitions already marked complete.  → stats dict.

    Partition values must be filesystem-safe strings (the marker scan
    parses ``<col>=<value>`` directory names literally) — derive the
    partition column from a hash/prefix when raw keys contain path
    separators."""
    os.makedirs(root, exist_ok=True)
    done = completed_partitions(root, partition_col)
    prefix = partition_col + "="
    # clear unmarked partials from a crashed run
    cleared = 0
    for d in os.listdir(root):
        if d.startswith(prefix) and d[len(prefix):] not in done:
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)
            cleared += 1

    if done:
        done_arr = pa.array(sorted(done), pa.string())

        def drop_done(t: pa.Table) -> pa.Table:
            vals = pc.cast(t.column(partition_col), pa.string())
            return t.filter(pc.invert(pc.is_in(vals, value_set=done_arr)))

        ds = ds.map_batches(drop_done, batch_format="pyarrow")

    ds = ds.materialize()
    n = ds.count()
    if n:
        ds.write_parquet(root, partition_cols=[partition_col])
    # mark everything now present and unmarked (all newly written)
    newly = 0
    for d in os.listdir(root):
        if d.startswith(prefix) and d[len(prefix):] not in done:
            open(os.path.join(root, d, _MARKER), "w").close()
            newly += 1
    return {"skipped_partitions": len(done), "cleared_partials": cleared,
            "written_partitions": newly, "rows_written": n}
