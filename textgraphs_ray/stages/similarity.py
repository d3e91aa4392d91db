"""Similarity search over an embedding column (``list<float>``).

- :func:`knn_brute` — brute-force cosine top-k baseline: every batch is
  one numpy matmul against the broadcast query matrix (``ray.put``
  once, fetched once per task); per-batch partial top-k rows merge via
  :func:`_merge_topk` — a tiny driver sort when Q is small, a
  distributed groupby(query_id) reduce for batched-query ANN so no task
  (and never the driver) sees the O(blocks·Q·k) concatenation.
  O(N·Q·D) but perfectly streaming — the correctness oracle for the
  ANN path.

- :func:`knn_lsh` — random-hyperplane LSH (IVF-style scale path): probe
  only buckets matching the query signature (multi-probe over Hamming
  ≤ 1 signatures), exact cosine rerank inside probed buckets.  Recall
  < 1 by design; the bucket fanout bounds per-query work independent
  of N.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..functions.vec import embeddings_to_ndarray, ids_to_ndarray


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _empty_topk() -> pd.DataFrame:
    return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                         "rank": pd.Series([], dtype="int64"),
                         "vec_id": pd.Series([], dtype="int64"),
                         "sim": pd.Series([], dtype="float64")})


_DRIVER_MERGE_MAX_Q = 64


def _merge_topk(parts: "ray.data.Dataset", k: int, *, num_queries: int,
                exclude_self: bool = False) -> pd.DataFrame:
    """Merge per-block partial top-k rows into the final (Q·k)-row
    answer.

    Two physical plans, picked by query count:

    - **small Q** (≤ ``_DRIVER_MERGE_MAX_Q``): collect the partials —
      bounded at blocks·Q·k rows, a few thousand — and sort on the
      driver.  A groupby shuffle here costs more than the whole merge.
    - **large Q** (batched ANN over many queries): distributed
      groupby(query_id) reduce — each group holds ≤ blocks·k rows, so
      no single task (and never the driver) sees the O(blocks·Q·k)
      concatenation; only the final Q·k rows come back.
    """
    if num_queries <= _DRIVER_MERGE_MAX_Q:
        out = parts.to_pandas()
        if out.empty:
            return _empty_topk()
        out = out.sort_values(["query_id", "sim", "vec_id"],
                              ascending=[True, False, True], kind="stable")
        if exclude_self:
            out = out[out["query_id"] != out["vec_id"]]
        top = (out.groupby("query_id", sort=True).head(k)
               .reset_index(drop=True))
        top["rank"] = top.groupby("query_id").cumcount()
        return top[["query_id", "rank", "vec_id", "sim"]]

    def grp(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True],
                          kind="stable")
        if exclude_self:
            g = g[g["query_id"] != g["vec_id"]]
        g = g.head(k).reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int64)
        return g[["query_id", "rank", "vec_id", "sim"]]

    out = (parts.groupby("query_id")
           .map_groups(grp, batch_format="pandas").to_pandas())
    if out.empty:
        return _empty_topk()
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


def knn_brute(ds: "ray.data.Dataset", queries: np.ndarray, *, k: int = 5,
              emb_col: str = "embedding", id_col: str = "vec_id",
              exclude_self: bool = False) -> pd.DataFrame:
    """→ DataFrame (query_id, rank, vec_id, sim): exact top-k.

    ``queries`` is (Q, D); broadcast once.  Ties broken by vec_id asc
    so results are deterministic.
    """
    qn = _normalize(np.asarray(queries, dtype=np.float32))
    q_ref = ray.put(qn)

    def score(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        emb = embeddings_to_ndarray(batch.column(emb_col))
        ids = ids_to_ndarray(batch.column(id_col))
        sims = _normalize(emb) @ q.T  # (N, Q)
        kk = min(k + (1 if exclude_self else 0), sims.shape[0])
        # widen each per-query cut to all rows tied with the kk-th
        # largest sim: bit-identical cosines at the boundary must be
        # decided by the merge's (sim DESC, vec_id ASC) order, not by
        # block-local argpartition order (same fix as knn_classify)
        bound = np.partition(sims, sims.shape[0] - kk,
                             axis=0)[sims.shape[0] - kk, :]
        out_q, out_id, out_sim = [], [], []
        for qi in range(q.shape[0]):
            idx = np.flatnonzero(sims[:, qi] >= bound[qi])
            out_q.extend([qi] * len(idx))
            out_id.extend(ids[idx].tolist())
            out_sim.extend(sims[idx, qi].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_id, pa.int64()),
            "sim": pa.array(out_sim, pa.float64()),
        })

    parts = ds.map_batches(score, batch_format="pyarrow")
    return _merge_topk(parts, k, num_queries=qn.shape[0],
                       exclude_self=exclude_self)


def knn_lsh(ds: "ray.data.Dataset", queries: np.ndarray, *, k: int = 5,
            emb_col: str = "embedding", id_col: str = "vec_id",
            planes: int = 8, seed: int = 42,
            exclude_self: bool = False) -> pd.DataFrame:
    """Approximate top-k: hyperplane-bucketed scan with multi-probe.

    Each batch computes bucket signatures for its vectors and scores
    only those whose signature is within Hamming ≤ 1 of a query
    signature — per-batch work shrinks with bucket selectivity.

    ``planes=0`` degenerates to a single all-inclusive bucket — an
    exhaustive scan output-identical to :func:`knn_brute` (the
    ``knn_lsh_oracle`` forced-plan entry uses this to share the brute
    SQL oracle; parity pytest-asserted).
    """
    queries = np.asarray(queries, dtype=np.float32)
    rng = np.random.RandomState(seed)
    plane_mat = rng.standard_normal(
        (queries.shape[1], planes)).astype(np.float32)
    qn = _normalize(queries)
    q_sig = ((qn @ plane_mat) > 0) @ (1 << np.arange(planes, dtype=np.int64))
    # multi-probe: accept buckets at Hamming ≤ 1 from each query signature
    probe_sets = []
    for s in q_sig:
        probes = {int(s)}
        for b in range(planes):
            probes.add(int(s) ^ (1 << b))
        probe_sets.append(probes)
    shared = ray.put((qn, plane_mat, probe_sets))

    def score(batch: pa.Table) -> pa.Table:
        q, planes_m, probes = ray.get(shared)
        emb = embeddings_to_ndarray(batch.column(emb_col))
        ids = ids_to_ndarray(batch.column(id_col))
        en = _normalize(emb)
        sig = ((en @ planes_m) > 0) @ (1 << np.arange(planes_m.shape[1],
                                                      dtype=np.int64))
        out_q, out_id, out_sim = [], [], []
        for qi, probe in enumerate(probes):
            mask = np.isin(sig, list(probe))
            if not mask.any():
                continue
            sims = en[mask] @ q[qi]
            sub_ids = ids[mask]
            kk = min(k + (1 if exclude_self else 0), len(sims))
            # keep every row tied with the kk-th largest sim so the
            # merge's (sim DESC, vec_id ASC) order decides survivors
            bound = np.partition(sims, len(sims) - kk)[len(sims) - kk]
            idx = np.flatnonzero(sims >= bound)
            out_q.extend([qi] * len(idx))
            out_id.extend(sub_ids[idx].tolist())
            out_sim.extend(sims[idx].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_id, pa.int64()),
            "sim": pa.array(out_sim, pa.float64()),
        })

    parts = ds.map_batches(score, batch_format="pyarrow")
    return _merge_topk(parts, k, num_queries=qn.shape[0],
                       exclude_self=exclude_self)


def kmeans_distributed(ds: "ray.data.Dataset", ncells: int, *,
                       emb_col: str = "embedding", iters: int = 8,
                       sample_size: int = 4096,
                       seed: int = 42) -> np.ndarray:
    """Distributed Lloyd's k-means over the FULL dataset → (ncells, D)
    normalized centroids.

    Each iteration is one streaming pass: centroids broadcast via
    ``ray.put``; every batch assigns its vectors with one matmul and
    emits PARTIAL per-cell (sum, count) rows (the map-side combiner),
    so the reduce is a groupby over ≤ cells·blocks tiny rows and the
    driver only ever holds the (ncells, D) centroid matrix.  Contrast
    :func:`kmeans_centroids`, which trains on a bounded driver-side
    sample — this is the scale path when the sample's coverage isn't
    enough (clusters rarer than 1/sample_size).  Deterministic: seeded
    init from the stream head, ties broken by cell index."""
    init = np.asarray(
        [r[emb_col] for r in ds.limit(sample_size).take_all()],
        dtype=np.float32)
    if len(init) == 0:
        return np.zeros((0, 0), dtype=np.float32)
    cent = kmeans_centroids(init, ncells, iters=1, seed=seed)

    for _ in range(iters):
        c_ref = ray.put(cent)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(c_ref)
            emb = embeddings_to_ndarray(batch.column(emb_col))
            if emb.size == 0:
                return pa.table({
                    "cell": pa.array([], pa.int32()),
                    "vec_sum": pa.array([], pa.list_(pa.float32())),
                    "n": pa.array([], pa.int64())})
            en = _normalize(emb)
            assign = np.argmax(en @ c.T, axis=1)
            cells = np.unique(assign)
            sums = np.zeros((len(cells), emb.shape[1]), np.float32)
            counts = np.zeros(len(cells), np.int64)
            for ci, cell in enumerate(cells):
                m = assign == cell
                sums[ci] = en[m].sum(axis=0)
                counts[ci] = int(m.sum())
            return pa.table({
                "cell": pa.array(cells.astype(np.int32)),
                "vec_sum": pa.array(list(sums)),
                "n": pa.array(counts),
            })

        rows = (ds.map_batches(partial, batch_format="pyarrow")
                .to_pandas())  # ≤ ncells·blocks tiny rows
        new_cent = cent.copy()
        for cell, grp in rows.groupby("cell"):
            total = np.sum(np.stack(grp["vec_sum"].to_numpy()), axis=0)
            cnt = int(grp["n"].sum())
            if cnt:
                new_cent[int(cell)] = total / cnt
        cent = _normalize(new_cent)
    return cent


def kmeans_centroids(sample: np.ndarray, ncells: int, *, iters: int = 8,
                     seed: int = 42) -> np.ndarray:
    """Seeded Lloyd's k-means on a driver-side sample → (ncells, D)
    normalized centroids.  The sample is small (≤ 4096 rows) — at 100 TB
    this is `ds.limit(4096)` off the stream head, not a materialize."""
    rng = np.random.RandomState(seed)
    sn = _normalize(sample.astype(np.float32))
    cent = sn[rng.choice(len(sn), size=min(ncells, len(sn)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(sn @ cent.T, axis=1)
        for c in range(cent.shape[0]):
            members = sn[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def knn_ivf(ds: "ray.data.Dataset", queries: np.ndarray, *, k: int = 5,
            emb_col: str = "embedding", id_col: str = "vec_id",
            ncells: int = 16, nprobe: int = 4, sample_size: int = 4096,
            seed: int = 42, train: str = "sample") -> pd.DataFrame:
    """IVF-style ANN: coarse k-means cells, queries probe their
    ``nprobe`` nearest cells, exact cosine rerank inside probed cells.

    The centroid table is trained once — from a bounded driver-side
    sample by default, or over the FULL dataset with
    ``train="distributed"`` (:func:`kmeans_distributed`, map-side
    partial sums per iteration) — and broadcast (``ray.put``); each
    batch assigns its vectors to cells with one matmul and scores only
    rows falling in a probed cell — per-query work scales with
    nprobe/ncells of the data, not N.
    """
    if train == "distributed":
        cent = kmeans_distributed(ds, ncells, emb_col=emb_col,
                                  sample_size=sample_size, seed=seed)
        if cent.size == 0:
            return _empty_topk()
    else:
        sample_rows = [r[emb_col] for r in ds.limit(sample_size).take_all()]
        if not sample_rows:
            return _empty_topk()
        sample = np.asarray(sample_rows, dtype=np.float32)
        cent = kmeans_centroids(sample, ncells, seed=seed)
    qn = _normalize(np.asarray(queries, dtype=np.float32))
    np_ = min(nprobe, cent.shape[0])
    probe = np.argsort(-(qn @ cent.T), axis=1)[:, :np_]  # (Q, nprobe)
    shared = ray.put((qn, cent, probe))

    def score(batch: pa.Table) -> pa.Table:
        q, cmat, probes = ray.get(shared)
        emb = embeddings_to_ndarray(batch.column(emb_col))
        ids = ids_to_ndarray(batch.column(id_col))
        en = _normalize(emb)
        cell = np.argmax(en @ cmat.T, axis=1)
        out_q, out_id, out_sim = [], [], []
        for qi in range(q.shape[0]):
            mask = np.isin(cell, probes[qi])
            if not mask.any():
                continue
            sims = en[mask] @ q[qi]
            sub_ids = ids[mask]
            kk = min(k, len(sims))
            # boundary-tie widening (see knn_brute): the merge order
            # (sim DESC, vec_id ASC) must decide tied survivors
            bound = np.partition(sims, len(sims) - kk)[len(sims) - kk]
            idx = np.flatnonzero(sims >= bound)
            out_q.extend([qi] * len(idx))
            out_id.extend(sub_ids[idx].tolist())
            out_sim.extend(sims[idx].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_id, pa.int64()),
            "sim": pa.array(out_sim, pa.float64()),
        })

    parts = ds.map_batches(score, batch_format="pyarrow")
    return _merge_topk(parts, k, num_queries=qn.shape[0])


def knn_self_join(ds: "ray.data.Dataset", *, k: int = 5,
                  emb_col: str = "embedding", id_col: str = "vec_id",
                  ncells: int = 16, nprobe: int = 4,
                  sample_size: int = 4096, seed: int = 42,
                  exclude_self: bool = True,
                  dtype=np.float32,
                  cell_cap: int = 65536) -> "ray.data.Dataset":
    """Distributed k-NN GRAPH construction: top-k cosine neighbors for
    EVERY row of the table → Dataset (query_id=vec_id, rank, vec_id,
    sim).

    :func:`knn_brute`/:func:`knn_ivf` answer a small broadcast query
    set; building a kNN graph (SemDeDup, clustering, retrieval prep)
    needs all N rows as queries, which no broadcast can hold.  Plan:

    1. train coarse k-means cells (bounded sample, as knn_ivf);
    2. a tiny combiner-fed pre-pass counts members per cell; cells
       above ``cell_cap`` members split into ``ceil(n/cell_cap)``
       salted SUB-cells (members hash into one sub-cell, queries
       replicate to every sub-cell of a probed cell; hashing balances
       to ~cell_cap members in expectation, hard-asserted at 2x) —
       k-means cells
       are data-adaptive and skew with corpus geometry, and without
       the cap one hot cell's full query×member matrix lands in a
       single task;
    3. one pass emits every vector once as a MEMBER of its argmax
       sub-cell, and once per probed sub-cell as a QUERY — the stream
       is N·(1+Σ splits(probed)) rows of (cell, role, id, vec);
    4. groupby(cell): one matmul queries×members per sub-cell (member
       side ≤ ``cell_cap`` by construction — asserted), local top-k
       per query;
    5. groupby(query): merge partial top-k (each member is in exactly
       one sub-cell, so the merge sees each candidate once — never
       the N×N similarity matrix anywhere).

    With ``nprobe = ncells`` every query scans every member, so the
    result is EXACTLY brute force — the oracle configuration; smaller
    ``nprobe`` trades recall for a 1/ncells-ish per-query scan.  The
    cap bounds the MEMBER side of each task's matmul; the query side
    of a sub-cell is the cell's probe traffic, which smaller nprobe
    spreads across cells.
    """
    sample_rows = [r[emb_col] for r in ds.limit(sample_size).take_all()]
    if not sample_rows:
        return ds.map_batches(
            lambda t: pa.table({
                "query_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64())}),
            batch_format="pyarrow")
    cent = kmeans_centroids(
        np.asarray(sample_rows, dtype=np.float32), ncells, seed=seed)
    cent_ref = ray.put(cent)
    np_ = min(nprobe, cent.shape[0])

    # pre-pass: per-cell member counts → per-cell split factors.
    # One streaming map_batches emitting ≤ ncells tiny rows per block
    # + one small groupby; the (ncells,) split table broadcasts.
    def count_cells(batch: pa.Table) -> pa.Table:
        cmat = ray.get(cent_ref)
        en = _normalize(embeddings_to_ndarray(batch.column(emb_col),
                                              dtype=dtype))
        cells, counts = np.unique(
            np.argmax(en @ cmat.T.astype(dtype), axis=1),
            return_counts=True)
        return pa.table({"cell": pa.array(cells.astype(np.int32)),
                         "n": pa.array(counts.astype(np.int64))})

    from ray.data.aggregate import Sum as _Sum
    counts = (ds.map_batches(count_cells, batch_format="pyarrow")
              .groupby("cell").aggregate(_Sum("n", alias_name="n"))
              .take_all())
    nsplit = np.ones(cent.shape[0], np.int64)
    for r in counts:
        nsplit[int(r["cell"])] = max(1, -(-int(r["n"]) // cell_cap))
    # composite key: cell * max_split + salt keeps sub-cells disjoint
    key_stride = int(nsplit.max())
    split_ref = ray.put(nsplit)
    _SALT_MUL = np.uint64(0x9E3779B97F4A7C15)  # Fibonacci hashing

    def emit(batch: pa.Table) -> pa.Table:
        cmat = ray.get(cent_ref)
        splits = ray.get(split_ref)
        ids = ids_to_ndarray(batch.column(id_col)).astype(np.int64)
        en = _normalize(embeddings_to_ndarray(batch.column(emb_col),
                                              dtype=dtype))
        sims = en @ cmat.T.astype(dtype)
        member_cell = np.argmax(sims, axis=1).astype(np.int64)
        probe = np.argsort(-sims, axis=1)[:, :np_].astype(np.int64)
        n = len(ids)
        # members: one salted sub-cell each
        m_salt = ((ids.view(np.uint64) * _SALT_MUL)
                  % splits[member_cell].view(np.uint64)).view(np.int64)
        m_key = member_cell * key_stride + m_salt
        # queries: replicate to EVERY sub-cell of each probed cell
        probe_flat = probe.ravel()                     # (n·np_,)
        rep = splits[probe_flat]                       # per-probe splits
        q_cell = np.repeat(probe_flat, rep)
        ends = np.cumsum(rep)
        q_salt = np.arange(ends[-1] if len(ends) else 0,
                           dtype=np.int64) - np.repeat(ends - rep, rep)
        q_key = q_cell * key_stride + q_salt
        q_row = np.repeat(np.repeat(np.arange(n), np_), rep)
        payload = np.asarray([e.tobytes() for e in en], dtype=object)
        return pa.table({
            "cell": pa.array(np.concatenate([m_key, q_key]), pa.int64()),
            "role": pa.array(np.concatenate(
                [np.zeros(n, np.int8), np.ones(len(q_key), np.int8)]),
                pa.int8()),
            "id": pa.array(np.concatenate(
                [ids, ids[q_row]]), pa.int64()),
            "vec": pa.array(np.concatenate([payload, payload[q_row]])
                            .tolist(), pa.binary()),
        })

    def cell_topk(g: pd.DataFrame) -> pd.DataFrame:
        mem = g[g["role"] == 0]
        qry = g[g["role"] == 1]
        # members hash into sub-cells: cell_cap is the expected load,
        # 2x is the hard bound (hash balance deviates ~sqrt(cap))
        assert len(mem) <= 2 * cell_cap, \
            f"sub-cell member count {len(mem)} exceeds 2x cap {cell_cap}"
        if not len(mem) or not len(qry):
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 "vec_id": pd.Series([], dtype="int64"),
                                 "sim": pd.Series([], dtype="float64")})
        mv = np.stack([np.frombuffer(b, dtype)
                       for b in mem["vec"].to_numpy()])
        qv = np.stack([np.frombuffer(b, dtype)
                       for b in qry["vec"].to_numpy()])
        mids = mem["id"].to_numpy()
        qids = qry["id"].to_numpy()
        sims = qv @ mv.T  # (Q, M)
        kk = min(k + (1 if exclude_self else 0), sims.shape[1])
        # boundary-tie widening (see knn_brute): keep all members
        # tied with each query's kk-th largest sim so the final
        # (sim DESC, vec_id ASC) merge decides tied survivors
        bound = np.partition(sims, sims.shape[1] - kk,
                             axis=1)[:, sims.shape[1] - kk]
        qi, mi = np.nonzero(sims >= bound[:, None])
        rows_q = qids[qi]
        rows_m = mids[mi]
        rows_s = sims[qi, mi]
        out = pd.DataFrame({"query_id": rows_q, "vec_id": rows_m,
                            "sim": rows_s.astype(np.float64)})
        if exclude_self:
            out = out[out["query_id"] != out["vec_id"]]
        return out

    def query_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop_duplicates(["vec_id"])
             .sort_values(["sim", "vec_id"], ascending=[False, True],
                          kind="stable").head(k).reset_index(drop=True))
        g["rank"] = np.arange(len(g), dtype=np.int64)
        return g[["query_id", "rank", "vec_id", "sim"]]

    emitted = ds.map_batches(emit, batch_format="pyarrow")
    partials = emitted.groupby("cell").map_groups(cell_topk,
                                                  batch_format="pandas")
    return partials.groupby("query_id").map_groups(query_topk,
                                                   batch_format="pandas")


def pq_train(sample: np.ndarray, *, m_sub: int = 8, n_centroids: int = 256,
             iters: int = 8, seed: int = 42) -> np.ndarray:
    """Product-quantization codebooks from a driver-side sample →
    (m_sub, n_centroids, D/m_sub) float32.

    PQ (Jégou et al., "Product Quantization for Nearest Neighbor
    Search", TPAMI 2011) splits each L2-normalized vector into
    ``m_sub`` subvectors and k-means-quantizes every subspace
    independently: a D-dim float32 vector becomes ``m_sub`` uint8
    codes — 32× smaller at D=64/m_sub=8, which is the difference
    between "the vector store fits in cluster RAM" and "it doesn't"
    at 10^9+ vectors.  Training is on a bounded stream-head sample
    (same contract as :func:`kmeans_centroids`), deterministic via
    ``seed``."""
    sample = _normalize(np.asarray(sample, dtype=np.float32))
    n, d = sample.shape
    if d % m_sub:
        raise ValueError(f"D={d} not divisible by m_sub={m_sub}")
    dsub = d // m_sub
    rng = np.random.RandomState(seed)
    ncent = min(n_centroids, n)
    books = np.zeros((m_sub, ncent, dsub), np.float32)
    for j in range(m_sub):
        sub = sample[:, j * dsub:(j + 1) * dsub]
        cent = sub[rng.choice(n, size=ncent, replace=False)].copy()
        for _ in range(iters):
            # Euclidean assignment in the subspace (NOT cosine — the
            # subvectors aren't unit vectors)
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(ncent):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[j] = cent
    return books


def _pq_codes(emb_n: np.ndarray, books: np.ndarray) -> np.ndarray:
    """L2-normalized vectors → (n, m_sub) uint8/uint16 codes."""
    m_sub, ncent, dsub = books.shape
    codes = np.zeros((emb_n.shape[0], m_sub),
                     np.uint8 if ncent <= 256 else np.uint16)
    for j in range(m_sub):
        sub = emb_n[:, j * dsub:(j + 1) * dsub]
        # argmin ||x - c||^2 = argmax <x,c> - ||c||^2/2, one matmul
        score = sub @ books[j].T - 0.5 * (books[j] ** 2).sum(axis=1)
        codes[:, j] = np.argmax(score, axis=1)
    return codes


def pq_encode(ds: "ray.data.Dataset", books: np.ndarray, *,
              emb_col: str = "embedding",
              code_col: str = "pq_code") -> "ray.data.Dataset":
    """Append ``code_col`` (list<uint8>, m_sub bytes per row) — the
    compressed vector-store representation.  Codebooks broadcast once;
    one stateless vectorized pass."""
    b_ref = ray.put(np.ascontiguousarray(books))

    def encode(batch: pa.Table) -> pa.Table:
        b = ray.get(b_ref)
        emb = embeddings_to_ndarray(batch.column(emb_col))
        if emb.size == 0:
            return batch.append_column(
                code_col, pa.array([], pa.list_(pa.uint8())))
        codes = _pq_codes(_normalize(emb), b)
        return batch.append_column(code_col, pa.array(list(codes)))

    return ds.map_batches(encode, batch_format="pyarrow")


def knn_pq(ds: "ray.data.Dataset", queries: np.ndarray, *, k: int = 5,
           emb_col: str = "embedding", id_col: str = "vec_id",
           m_sub: int = 8, n_centroids: int = 256,
           sample_size: int = 4096, seed: int = 42) -> pd.DataFrame:
    """Approximate top-k cosine via PQ asymmetric distance (ADC).

    Per batch: encode rows to ``m_sub`` uint8 codes, then score every
    query with ONE table lookup per subspace — the query builds a
    (m_sub, n_centroids) inner-product lookup table against the
    codebooks, and a row's approximate cosine is the sum of its
    ``m_sub`` table entries.  No D-dim arithmetic per row·query pair,
    and the scan state is 32× smaller than the raw vectors — the
    memory-bound regime's answer at 10^9 vectors (brute force stays
    the small-N oracle, ``knn_brute``).  Per-block partial top-k rows
    merge through the same distributed reduce as the other ANN ops
    (:func:`_merge_topk`).  Recall < 1 by construction; asserted
    against brute force in tests (tests/test_pq.py)."""
    qn = _normalize(np.asarray(queries, dtype=np.float32))
    if qn.size == 0:
        return _empty_topk()
    # the training sample doubles as the emptiness probe — a count()
    # here would execute the whole upstream once just to check for 0
    sample_rows = [r[emb_col] for r in ds.limit(sample_size).take_all()]
    if not sample_rows:
        return _empty_topk()
    sample = np.asarray(sample_rows, dtype=np.float32)
    books = pq_train(sample, m_sub=m_sub, n_centroids=n_centroids,
                     seed=seed)
    m, ncent, dsub = books.shape
    # (Q, m_sub, ncent) inner-product lookup tables, broadcast once
    luts = np.einsum("qmd,mcd->qmc", qn.reshape(-1, m, dsub),
                     books).astype(np.float32)
    b_ref = ray.put(np.ascontiguousarray(books))
    l_ref = ray.put(np.ascontiguousarray(luts))

    def score(batch: pa.Table) -> pa.Table:
        b = ray.get(b_ref)
        lut = ray.get(l_ref)
        emb = embeddings_to_ndarray(batch.column(emb_col))
        ids = ids_to_ndarray(batch.column(id_col))
        if emb.size == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        codes = _pq_codes(_normalize(emb), b)  # (N, m)
        nq = lut.shape[0]
        sims = np.zeros((nq, len(ids)), np.float32)
        for j in range(lut.shape[1]):
            sims += lut[:, j, codes[:, j]]  # (Q, N) gather per subspace
        kk = min(k, sims.shape[1])
        # boundary-tie widening: quantized ADC scores tie often, so a
        # sim-only cut would make the candidate set depend on block
        # layout; keep all tied rows and let the deterministic merge
        # order decide (same fix as knn_brute/knn_classify)
        bound = np.partition(sims, sims.shape[1] - kk,
                             axis=1)[:, sims.shape[1] - kk]
        qi, vi = np.nonzero(sims >= bound[:, None])
        return pa.table({
            "query_id": pa.array(qi.astype(np.int64)),
            "vec_id": pa.array(ids[vi]),
            "sim": pa.array(sims[qi, vi].astype(np.float64)),
        })

    parts = ds.map_batches(score, batch_format="pyarrow")
    return _merge_topk(parts, k, num_queries=qn.shape[0])


def knn_classify(ds: "ray.data.Dataset", *, k: int = 5,
                 n_queries: int = 100, emb_col: str = "embedding",
                 id_col: str = "vec_id", label_col: str = "label"
                 ) -> pa.Table:
    """Majority-vote kNN classifier: for each of the first
    ``n_queries`` vectors (by id), the modal label among its ``k``
    nearest neighbors by cosine (self excluded), ties → smallest
    label.  → (vec_id, pred_label, votes).

    One stateless broadcast scan: the query matrix ships via
    ``ray.put`` once; each batch scores its rows against all queries
    in FLOAT64 (so the ranking agrees with a float64 SQL oracle to
    ~1e-15 — the vote is discrete, so rank jitter inside the top-k
    only matters across label boundaries) and emits its per-query
    top-(k+1) partials WITH labels.  The driver merge folds
    blocks·Q·(k+1) bounded rows; the vote is a vectorized bincount.
    At web scale raise the partial merge to the distributed
    groupby(query) plan `_merge_topk` already implements.
    """
    qrows = (ds.sort(id_col).limit(n_queries)
             .select_columns([id_col, emb_col]).take_all())
    q_ids = np.array([r[id_col] for r in qrows], np.int64)
    qm = np.stack([np.asarray(r[emb_col], np.float64) for r in qrows])
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    q_ref = ray.put((q_ids, qn))
    kk = k + 1  # self may rank first; drop it in the merge

    def score(batch: pa.Table) -> pa.Table:
        qi, qmat = ray.get(q_ref)
        emb = embeddings_to_ndarray(batch.column(emb_col),
                                    dtype=np.float64)
        ids = ids_to_ndarray(batch.column(id_col))
        labs = batch.column(label_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        sims = en @ qmat.T  # (N, Q)
        take = min(kk, sims.shape[0])
        # per-query boundary similarity (take-th largest), then widen
        # the cut to EVERY row tied with it: with bit-identical
        # cosines (duplicate embeddings) a sim-only argpartition can
        # drop the smaller-id neighbor the deterministic
        # (sim DESC, nb ASC) oracle order keeps — the driver merge,
        # not block-local partition luck, must decide survivors.
        bound = np.partition(sims, sims.shape[0] - take,
                             axis=0)[sims.shape[0] - take, :]
        out_q, out_id, out_lab, out_sim = [], [], [], []
        for c in range(qmat.shape[0]):
            idx = np.flatnonzero(sims[:, c] >= bound[c])
            out_q.extend([qi[c]] * len(idx))
            out_id.extend(ids[idx].tolist())
            out_lab.extend(labs[idx].tolist())
            out_sim.extend(sims[idx, c].tolist())
        return pa.table({"q": pa.array(out_q, pa.int64()),
                         "nb": pa.array(out_id, pa.int64()),
                         "lab": pa.array(out_lab, pa.int64()),
                         "sim": pa.array(out_sim, pa.float64())})

    parts = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    parts = parts[parts["q"] != parts["nb"]]
    parts = parts.sort_values(["q", "sim", "nb"],
                              ascending=[True, False, True],
                              kind="stable")
    top = parts.groupby("q", sort=True).head(k)
    votes = (top.groupby(["q", "lab"], sort=False).size()
             .reset_index(name="c")
             .sort_values(["q", "c", "lab"],
                          ascending=[True, False, True],
                          kind="stable")
             .groupby("q", sort=True).head(1))
    return pa.table({
        "vec_id": pa.array(votes["q"].to_numpy(np.int64)),
        "pred_label": pa.array(votes["lab"].to_numpy(np.int64)),
        "votes": pa.array(votes["c"].to_numpy(np.int64))})
