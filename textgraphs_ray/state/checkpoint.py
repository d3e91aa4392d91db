"""Per-stage, per-partition checkpoints with a manifest (SURVEY.md S9).

The reference's only resume path is a whole-graph JSON dump
(``/root/reference/textgraphs/graph.py:236-391``); the north rule
requires per-partition lineage ("runs resume mid-stage").  Layout::

    <root>/<stage>/data/part-*.parquet     (atomic: written to .tmp, renamed)
    <root>/<stage>/MANIFEST.json           {stage, rows, content_hash, meta}

A stage checkpoint is complete iff its MANIFEST exists — the rename
barrier makes partially written stages invisible to resume.  Lance is
the preferred format when :func:`lance_available` confirms a working
``write_lance`` (a real probe, not just an import check); the manifest
records the format and ``read_stage`` dispatches on it, so parquet
checkpoints written here remain readable after pylance appears.

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

_LANCE_OK: bool | None = None  # capability probe result, cached


def lance_available() -> bool:
    """REAL Lance capability gate (north_rule storage layer): true only
    when the ``lance`` package imports AND a probe ``write_lance`` of a
    one-row dataset succeeds.  Probed once per process, lazily (Ray may
    not be initialized at import time).  This container ships parquet
    only, so the probe fails here — but the gate auto-activates wherever
    pylance exists, with no code change."""
    global _LANCE_OK
    if _LANCE_OK is None:
        try:
            import tempfile

            import lance  # noqa: F401
            import pyarrow as pa

            probe_dir = tempfile.mkdtemp(prefix="lance_probe_")
            try:
                ray.data.from_arrow(
                    pa.table({"x": [1]})).write_lance(probe_dir)
                _LANCE_OK = True
            finally:
                shutil.rmtree(probe_dir, ignore_errors=True)
        except Exception:  # noqa: BLE001 — any failure means "no lance"
            _LANCE_OK = False
    return _LANCE_OK


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
                *, meta: dict | None = None, hash_cols=None,
                fmt: str | None = None) -> dict:
    """Materialize a stage to a partitioned sink + manifest, atomically.

    ``fmt``: "lance" | "parquet" | None (auto: lance when the
    capability probe passes, else parquet)."""
    if fmt is None:
        fmt = "lance" if lance_available() else "parquet"
    stage_dir = os.path.join(root, stage)
    tmp_dir = stage_dir + ".tmp"
    if os.path.exists(tmp_dir):
        shutil.rmtree(tmp_dir)
    os.makedirs(os.path.join(tmp_dir, "data"), exist_ok=True)
    ds = ds.materialize()
    if fmt == "lance":
        ds.write_lance(os.path.join(tmp_dir, "data"))
    else:
        ds.write_parquet(os.path.join(tmp_dir, "data"))
    manifest = {
        "stage": stage,
        "rows": ds.count(),
        "content_hash": _content_hash(ds, hash_cols),
        "format": fmt,
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
    manifest = read_manifest(root, stage) or {}
    path = os.path.join(root, stage, "data")
    if manifest.get("format") == "lance":
        return ray.data.read_lance(path)
    return ray.data.read_parquet(path)


def append_metrics(root: str, record: dict) -> None:
    """Append one JSON record to ``<root>/metrics.jsonl`` (north_rule:
    "throughput/recall metrics logged" next to the per-stage lineage).
    One line per stage per run — greppable, append-only, cheap."""
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "metrics.jsonl"), "a",
              encoding="utf-8") as fp:
        fp.write(json.dumps(record, sort_keys=True) + "\n")


def run_or_resume(root: str, stage: str, build_fn, *,
                  meta: dict | None = None, hash_cols=None):
    """Return ``(dataset, manifest, resumed)``; skips ``build_fn`` when
    a completed checkpoint exists.  Every call appends a metrics record
    (stage, rows, seconds, resumed, rows/sec) to ``metrics.jsonl``."""
    import time

    t0 = time.monotonic()
    manifest = read_manifest(root, stage)
    if manifest is not None:
        append_metrics(root, {"stage": stage, "rows": manifest["rows"],
                              "resumed": True,
                              "seconds": round(time.monotonic() - t0, 3)})
        return read_stage(root, stage), manifest, True
    ds = build_fn()
    manifest = write_stage(ds, root, stage, meta=meta, hash_cols=hash_cols)
    secs = time.monotonic() - t0
    append_metrics(root, {
        "stage": stage, "rows": manifest["rows"], "resumed": False,
        "seconds": round(secs, 3),
        "rows_per_sec": round(manifest["rows"] / secs, 1) if secs else None,
    })
    return read_stage(root, stage), manifest, False
