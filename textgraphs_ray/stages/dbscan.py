"""Grid DBSCAN — exact density clustering over integer 2-D points.

DBSCAN (Ester/Kriegel/Sander/Xu 1996, public) made deterministic and
hash-verifiable:

- a point is CORE iff its eps-ball holds ≥ ``min_pts`` points
  (self included — the sklearn convention);
- clusters are the connected components of the core-core eps-graph,
  labelled by the component's MINIMUM core id (classic DBSCAN's
  border assignment is scan-order-dependent; min-label makes it a
  pure function of the input);
- a BORDER point (non-core with ≥ 1 core neighbor) joins the minimum
  cluster label among its core neighbors; everything else is noise
  and omitted.

Physical plan (the GriDBSCAN halo scheme, Mahran & Mahar 2008 —
public):

1. coordinates are INTEGERS by contract (callers quantize floats
   first) so every distance comparison ``d² ≤ eps²`` is exact int64
   arithmetic — bit-parity with the SQL oracle for free;
2. each point replicates to its own eps-side grid cell plus the 8
   surrounding cells (halo) — any eps-neighbor pair shares at least
   one of the home cells, so each HOME group sees its points' FULL
   neighborhoods: neighbor counts are exact with no cross-group
   combine.  Cells ride ``GRID_PARTITIONS`` coarse hash partitions
   (per-cell map_groups overhead dominated once cells shrink — the
   cooccurrence_edges lesson); per-cell work is a tiny dense d²
   matrix, vectorized;
3. core flags rejoin the replicated stream through ONE
   empty-partition-safe shuffle_join on id; a second grouped pass
   emits each core-core edge exactly once (from the smaller id's home
   cell) and every border→core adjacency;
4. components run through :func:`..stages.cluster.propagate_labels`
   (driver union-find under the threshold, the distributed
   join+pointer-jump loop above it) on ZERO-PADDED ids so the
   min-label is lexicographic = numeric; border labels are one
   groupby-min over the adjacency joined to the labels.

No counterpart in the reference engine — density clustering is one of
the beyond-reference curation operators (embedding-space outlier and
cluster structure over quantized 2-D projections).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Min

from .cluster import propagate_labels
from .join import shuffle_join

#: coarse shuffle key: cells per partition, not per-cell groups
GRID_PARTITIONS = 64

_PAD = 12  # zero-pad width for lexicographic == numeric min labels


def _replicated(ds, *, id_col: str, x_col: str, y_col: str, eps: int):
    """→ (part, cx, cy, home, id, x, y): each point in its home cell
    and the 8 halo cells."""

    def rep(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        xs = t.column(x_col).to_numpy(zero_copy_only=False)
        ys = t.column(y_col).to_numpy(zero_copy_only=False)
        cx = np.floor_divide(xs, eps)
        cy = np.floor_divide(ys, eps)
        n = len(ids)
        out = {"cx": [], "cy": [], "home": [], "id": [], "x": [],
               "y": []}
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                out["cx"].append(cx + dx)
                out["cy"].append(cy + dy)
                out["home"].append(
                    np.full(n, dx == 0 and dy == 0, dtype=bool))
                out["id"].append(ids)
                out["x"].append(xs)
                out["y"].append(ys)
        ccx = np.concatenate(out["cx"])
        ccy = np.concatenate(out["cy"])
        part = ((ccx.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                 + ccy.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F))
                >> np.uint64(58)).astype(np.int32)
        return pa.table({
            "part": pa.array(part),
            "cx": pa.array(ccx.astype(np.int64)),
            "cy": pa.array(ccy.astype(np.int64)),
            "home": pa.array(np.concatenate(out["home"])),
            "id": pa.array(np.concatenate(out["id"]).astype(np.int64)),
            "x": pa.array(np.concatenate(out["x"]).astype(np.int64)),
            "y": pa.array(np.concatenate(out["y"]).astype(np.int64))})

    return ds.map_batches(rep, batch_format="pyarrow")


def grid_dbscan(ds: "ray.data.Dataset", *, id_col: str, x_col: str,
                y_col: str, eps: int = 1, min_pts: int = 4,
                num_partitions: int = 16,
                driver_threshold: int = 2_000_000
                ) -> "ray.data.Dataset":
    """→ (id, cluster_id, role ∈ {core, border}): deterministic DBSCAN
    over integer coordinates (see module doc).  Noise points are
    omitted.  ``eps``/``min_pts`` as in the original algorithm."""
    out_schema = pa.schema([("id", pa.int64()),
                            ("cluster_id", pa.int64()),
                            ("role", pa.string())])
    if ds.schema() is None:
        return ray.data.from_arrow(out_schema.empty_table())
    e2 = eps * eps
    rep = _replicated(ds, id_col=id_col, x_col=x_col, y_col=y_col,
                      eps=eps).materialize()

    def counts(g: pd.DataFrame) -> pd.DataFrame:
        out_id, out_n = [], []
        for _, cell in g.groupby(["cx", "cy"], sort=False):
            home = cell["home"].to_numpy()
            if not home.any():
                continue
            x = cell["x"].to_numpy()
            y = cell["y"].to_numpy()
            d2 = ((x[home][:, None] - x[None, :]) ** 2
                  + (y[home][:, None] - y[None, :]) ** 2)
            out_id.append(cell["id"].to_numpy()[home])
            out_n.append((d2 <= e2).sum(1))
        if not out_id:
            return pd.DataFrame({"id": pd.Series([], dtype="int64"),
                                 "n_nb": pd.Series([], dtype="int64")})
        return pd.DataFrame({"id": np.concatenate(out_id),
                             "n_nb": np.concatenate(out_n)})

    flags = (rep.groupby("part")
             .map_groups(counts, batch_format="pandas")
             .map_batches(
                 lambda t: t.append_column(
                     "is_core", pa.array(
                         t.column("n_nb").to_numpy(zero_copy_only=False)
                         >= min_pts)),
                 batch_format="pyarrow")
             .materialize())
    if flags.count() == 0:
        return ray.data.from_arrow(out_schema.empty_table())

    tagged = shuffle_join(
        rep, flags.select_columns(["id", "is_core"]), "id", "id",
        num_partitions).materialize()

    def adjacency(g: pd.DataFrame) -> pd.DataFrame:
        """Core-core edges (exactly once, from the smaller id's home
        cell) + border→core adjacency rows."""
        kind, a_out, b_out = [], [], []
        for _, cell in g.groupby(["cx", "cy"], sort=False):
            home = cell["home"].to_numpy()
            if not home.any():
                continue
            x = cell["x"].to_numpy()
            y = cell["y"].to_numpy()
            ids = cell["id"].to_numpy()
            core = cell["is_core"].to_numpy()
            d2 = ((x[home][:, None] - x[None, :]) ** 2
                  + (y[home][:, None] - y[None, :]) ** 2)
            nbm = d2 <= e2
            h_ids = ids[home]
            h_core = core[home]
            for i in range(len(h_ids)):
                nb = nbm[i]
                if h_core[i]:
                    # emit each core-core pair from the smaller id
                    sel = nb & core & (ids > h_ids[i])
                    for q in ids[sel]:
                        kind.append("e")
                        a_out.append(h_ids[i])
                        b_out.append(q)
                else:
                    sel = nb & core
                    for q in ids[sel]:
                        kind.append("b")
                        a_out.append(h_ids[i])
                        b_out.append(q)
        return pd.DataFrame({
            "kind": pd.Series(kind, dtype="object"),
            "a": pd.Series(a_out, dtype="int64"),
            "b": pd.Series(b_out, dtype="int64")})

    adj = (tagged.groupby("part")
           .map_groups(adjacency, batch_format="pandas")
           .materialize())

    def pad(col):
        return [f"{v:0{_PAD}d}" for v in col]

    core_nodes = flags.map_batches(
        lambda t: pa.table({"key": pa.array(pad(
            t.column("id").filter(
                t.column("is_core")).to_pylist()), pa.string())}),
        batch_format="pyarrow")
    core_edges = adj.map_batches(
        lambda t: (lambda tt: pa.table({
            "key_a": pa.array(pad(tt.column("a").to_pylist()),
                              pa.string()),
            "key_b": pa.array(pad(tt.column("b").to_pylist()),
                              pa.string())}))(
            t.filter(pc.equal(t.column("kind"), "e"))),
        batch_format="pyarrow")
    labels = propagate_labels(core_nodes, core_edges,
                              num_partitions=num_partitions,
                              driver_threshold=driver_threshold
                              ).materialize()

    def unpad_labels(t: pa.Table) -> pa.Table:
        return pa.table({
            "id": pa.array([int(k) for k in
                            t.column("key").to_pylist()], pa.int64()),
            "cluster_id": pa.array(
                [int(k) for k in t.column("cluster_id").to_pylist()],
                pa.int64()),
            "role": pa.array(["core"] * t.num_rows, pa.string())})

    cores_out = labels.map_batches(unpad_labels, batch_format="pyarrow")

    border_adj = adj.map_batches(
        lambda t: (lambda tt: pa.table({
            "bid": tt.column("a"),
            "key": pa.array(pad(tt.column("b").to_pylist()),
                            pa.string())}))(
            t.filter(pc.equal(t.column("kind"), "b"))),
        batch_format="pyarrow")
    border_lbl = shuffle_join(
        border_adj, labels, "key", "key", num_partitions,
        lambda df: pd.DataFrame({
            "bid": df["bid"],
            "cl": df["cluster_id"].astype(np.int64)}))
    if border_lbl.schema() is not None and border_lbl.schema().names:
        borders_out = (border_lbl.groupby("bid")
                       .aggregate(Min("cl", alias_name="cl"))
                       .map_batches(
                           lambda t: pa.table({
                               "id": t.column("bid"),
                               "cluster_id": pa.array(
                                   [int(k) for k in
                                    t.column("cl").to_pylist()],
                                   pa.int64()),
                               "role": pa.array(
                                   ["border"] * t.num_rows,
                                   pa.string())}),
                           batch_format="pyarrow"))
        cores_out = cores_out.union(borders_out)
    return cores_out.union(
        ray.data.from_arrow(out_schema.empty_table()))
