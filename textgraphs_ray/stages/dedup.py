"""Deduplication family for training-data pipelines.

Five operators, all built from the same primitives the ER chain uses
(hash partition, MinHash/LSH bands, label propagation):

- :func:`exact_dedup` — hash-partition + per-group first (the J1
  pattern on content hashes);
- :func:`minhash_dedup` — shingle → minhash → band → bucket groupby →
  Jaccard-verified pairs → connected components;
- :func:`simhash_dedup` — 64-bit SimHash, banded into 4×16-bit chunks
  (Hamming ≤ 3 guaranteed to collide on ≥1 chunk), verified by
  Hamming distance;
- :func:`ngram_jaccard_dedup` — banding for candidates, exact n-gram
  Jaccard as the verifier;
- :func:`embedding_dedup` — random-hyperplane LSH buckets over an
  embedding column, cosine-verified pairs.

Each returns ``(id, keep)`` / ``(id, dup_cluster)`` shaped Datasets so
the caller can anti-join survivors.  Pair generation within buckets is
capped (sorted-neighbor window) exactly like ER blocking — skew-safe.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Min

from ..functions.sketch import (band_keys, hamming64, hash64,
                                jaccard_shingles, minhash_batch,
                                simhash_batch)
from ..functions.strsim import cosine_batch
from .cluster import propagate_labels

PAIR_CAP_WINDOW = 8


def exact_dedup(ds: "ray.data.Dataset", *, text_col: str = "text",
                id_col: str = "doc_id") -> "ray.data.Dataset":
    """→ (fp, n_dups, keeper): one row per distinct content hash,
    keeper = min id.  Partial-aggregates per batch before the shuffle."""
    import hashlib

    def add_fp(batch: pa.Table) -> pd.DataFrame:
        df = batch.select([id_col, text_col]).to_pandas()
        df["fp"] = [hashlib.md5((t or "").encode()).hexdigest()
                    for t in df[text_col]]
        g = df.groupby("fp", as_index=False).agg(
            n_dups=(id_col, "size"), keeper=(id_col, "min"))
        return g

    from ray.data.aggregate import Sum

    partial = ds.map_batches(add_fp, batch_format="pyarrow")
    return partial.groupby("fp").aggregate(
        Min("keeper", alias_name="keeper"),
        Sum("n_dups", alias_name="n_dups"),
    )


def _bucket_pairs(g: pd.DataFrame, *, id_col: str = "id") -> pd.DataFrame:
    """Candidate pairs within one LSH bucket (sorted-window capped)."""
    g = g.drop_duplicates(id_col).sort_values(id_col, kind="stable")
    ids = g[id_col].to_numpy()
    payload = g["payload"].to_numpy()
    n = len(ids)
    if n < 2:
        return pd.DataFrame({"id_a": [], "id_b": [],
                             "payload_a": [], "payload_b": []})
    if n <= 2 * PAIR_CAP_WINDOW:
        iu, ju = np.triu_indices(n, k=1)
    else:
        offs = np.arange(1, PAIR_CAP_WINDOW + 1)
        iu = np.repeat(np.arange(n), len(offs))
        ju = iu + np.tile(offs, n)
        mask = ju < n
        iu, ju = iu[mask], ju[mask]
    return pd.DataFrame({
        "id_a": ids[iu], "id_b": ids[ju],
        "payload_a": payload[iu], "payload_b": payload[ju],
    })


def _pairs_to_clusters(ids_ds, pairs_df: pd.DataFrame,
                       *, id_col: str) -> "ray.data.Dataset":
    """Verified pairs → connected components over all ids."""
    nodes = ids_ds.map_batches(
        lambda t: pa.table({"key": pa.compute.cast(t.column(id_col),
                                                   pa.string())}),
        batch_format="pyarrow")
    if len(pairs_df) == 0:
        edges = ray.data.from_arrow(pa.table({
            "key_a": pa.array([], pa.string()),
            "key_b": pa.array([], pa.string())}))
    else:
        edges = ray.data.from_arrow(pa.table({
            "key_a": pa.array(pairs_df["id_a"].astype(str)),
            "key_b": pa.array(pairs_df["id_b"].astype(str))}))
    return propagate_labels(nodes, edges, num_partitions=8)


def minhash_dedup(ds: "ray.data.Dataset", *, text_col: str = "text",
                  id_col: str = "doc_id", num_perm: int = 64,
                  bands: int = 16, jaccard_threshold: float = 0.7,
                  concurrency=(1, 4)) -> "ray.data.Dataset":
    """MinHash-LSH near-dedup → clusters(key=id, cluster_id)."""

    class Bander:
        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = [str(v) for v in batch.column(id_col).to_pylist()]
            texts = [(t or "") for t in batch.column(text_col).to_pylist()]
            sigs = minhash_batch(texts, num_perm=num_perm)
            bh = band_keys(sigs, bands=bands)
            n = len(ids)
            return pa.table({
                "band_id": pa.array(
                    np.tile(np.arange(bands, dtype=np.int32), n)),
                "band_hash": pa.array(bh.ravel(), pa.uint64()),
                "id": pa.array(np.repeat(np.asarray(ids, object), bands),
                               pa.string()),
                "payload": pa.array(np.repeat(np.asarray(texts, object),
                                              bands), pa.string()),
            })

    banded = ds.map_batches(Bander, batch_format="pyarrow",
                            concurrency=concurrency)
    pairs = banded.groupby(["band_id", "band_hash"]).map_groups(
        _bucket_pairs, batch_format="pandas").to_pandas()
    if len(pairs):
        pairs = pairs.drop_duplicates(["id_a", "id_b"])
        jac = np.array([jaccard_shingles(a, b)
                        for a, b in zip(pairs["payload_a"],
                                        pairs["payload_b"])])
        pairs = pairs[jac >= jaccard_threshold]
    return _pairs_to_clusters(ds, pairs, id_col=id_col)


def simhash_dedup(ds: "ray.data.Dataset", *, text_col: str = "text",
                  id_col: str = "doc_id", max_hamming: int = 3,
                  concurrency=(1, 4)) -> "ray.data.Dataset":
    """SimHash near-dedup: 4×16-bit chunk banding (pigeonhole: any pair
    with Hamming ≤ 3 over 64 bits collides on ≥1 chunk)."""

    class Bander:
        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = [str(v) for v in batch.column(id_col).to_pylist()]
            texts = [(t or "") for t in batch.column(text_col).to_pylist()]
            sh = simhash_batch(texts)
            n = len(ids)
            chunks = np.stack([(sh >> np.uint64(16 * c)) & np.uint64(0xFFFF)
                               for c in range(4)], axis=1)
            return pa.table({
                "band_id": pa.array(np.tile(np.arange(4, dtype=np.int32), n)),
                "band_hash": pa.array(chunks.ravel(), pa.uint64()),
                "id": pa.array(np.repeat(np.asarray(ids, object), 4),
                               pa.string()),
                "payload": pa.array(
                    np.repeat(sh.astype(np.uint64), 4), pa.uint64()),
            })

    banded = ds.map_batches(Bander, batch_format="pyarrow",
                            concurrency=concurrency)
    pairs = banded.groupby(["band_id", "band_hash"]).map_groups(
        _bucket_pairs, batch_format="pandas").to_pandas()
    if len(pairs):
        pairs = pairs.drop_duplicates(["id_a", "id_b"])
        ham = hamming64(pairs["payload_a"].to_numpy().astype(np.uint64),
                        pairs["payload_b"].to_numpy().astype(np.uint64))
        pairs = pairs[ham <= max_hamming]
    return _pairs_to_clusters(ds, pairs, id_col=id_col)


def ngram_jaccard_dedup(ds: "ray.data.Dataset", *, text_col: str = "text",
                        id_col: str = "doc_id",
                        threshold: float = 0.8,
                        concurrency=(1, 4)) -> "ray.data.Dataset":
    """Exact n-gram Jaccard dedup (banding for candidates, exact
    verification — a stricter verifier than minhash_dedup)."""
    return minhash_dedup(ds, text_col=text_col, id_col=id_col,
                         jaccard_threshold=threshold,
                         concurrency=concurrency)


def embedding_dedup(ds: "ray.data.Dataset", *, emb_col: str = "embedding",
                    id_col: str = "vec_id", cosine_threshold: float = 0.9,
                    planes: int = 12, seed: int = 42,
                    concurrency=(1, 4)) -> "ray.data.Dataset":
    """Embedding-cosine near-dup: random-hyperplane LSH buckets then
    cosine verification.  The plane matrix is built once per actor."""

    class Bander:
        def __init__(self) -> None:
            self.planes = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = [str(v) for v in batch.column(id_col).to_pylist()]
            emb = np.asarray(batch.column(emb_col).to_pylist(),
                             dtype=np.float32)
            if self.planes is None:
                rng = np.random.RandomState(seed)
                self.planes = rng.standard_normal(
                    (emb.shape[1], planes)).astype(np.float32)
            bits = (emb @ self.planes) > 0
            bucket = bits @ (1 << np.arange(planes, dtype=np.int64))
            return pa.table({
                "band_id": pa.array(np.zeros(len(ids), np.int32)),
                "band_hash": pa.array(bucket.astype(np.uint64), pa.uint64()),
                "id": pa.array(ids, pa.string()),
                "payload": pa.array([e.tobytes() for e in emb], pa.binary()),
            })

    banded = ds.map_batches(Bander, batch_format="pyarrow",
                            concurrency=concurrency)
    pairs = banded.groupby(["band_id", "band_hash"]).map_groups(
        _bucket_pairs, batch_format="pandas").to_pandas()
    if len(pairs):
        pairs = pairs.drop_duplicates(["id_a", "id_b"])
        ea = np.stack([np.frombuffer(b, dtype=np.float32)
                       for b in pairs["payload_a"]])
        eb = np.stack([np.frombuffer(b, dtype=np.float32)
                       for b in pairs["payload_b"]])
        cos = cosine_batch(ea, eb)
        pairs = pairs[cos >= cosine_threshold]
    return _pairs_to_clusters(ds, pairs, id_col=id_col)
