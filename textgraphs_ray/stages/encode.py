"""Encoder actor pool + media decode stub.

The reference loads transformer models once per process and runs
batched inference (``/root/reference/textgraphs/rel.py:121-142``,
14.5 s load per ``docs/ex0_0.md:661-663``).  Here those stages are Ray
Data actor pools: the "model" (shingle-hash encoder + media asset
store) is built in ``__init__`` — once per actor, amortized across all
batches — and ``__call__`` does vectorized batched inference.

Media decoding is a STUB: real image/audio decoding libraries are not
in this container, so ``MediaDecodeStub`` resolves ``media_ref`` → text
payload from a broadcast asset table (``ray.put`` once on the driver,
``ray.get`` once per actor — never re-shipped per batch).  The Ray-side
plumbing (schema, batch size, actor signature, broadcast pattern) is
exactly what a real decoder pool would use.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.vec import embeddings_to_ndarray

import ray

from ..functions.sketch import shingle_embedding_batch

EMBED_DIM = 64


class ShingleEncoder:
    """Actor-pool stage: add an ``embedding`` list<float32> column for a
    text column.  Deterministic stand-in for a sentence-transformer;
    similar surface forms ⇒ high cosine."""

    def __init__(self, *, text_col: str = "text", dim: int = EMBED_DIM) -> None:
        self.text_col = text_col
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        emb = shingle_embedding_batch([t or "" for t in texts], dim=self.dim)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(emb.ravel(), pa.float32()), self.dim)
        return batch.append_column("embedding", col)


class MediaDecodeStub:
    """Actor-pool stage: decode ``media_ref`` → text payload.

    STUB: a production pipeline would fetch the blob and run an
    image/audio model; this sandbox "decodes" from a broadcast asset
    table.  Unknown refs decode to "" (kept, flagged by empty text).
    """

    def __init__(self, assets_ref: "ray.ObjectRef") -> None:
        # one ray.get per actor — broadcast join, not a shuffle
        assets: pa.Table = ray.get(assets_ref)
        refs = assets.column("media_ref").to_pylist()
        payloads = assets.column("payload").to_pylist()
        self.lookup: dict[str, str] = {
            r: (p.decode("utf-8") if isinstance(p, (bytes, bytearray)) else str(p))
            for r, p in zip(refs, payloads)
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        decoded = [self.lookup.get(r, "") for r in refs]
        return batch.append_column("decoded_text", pa.array(decoded, pa.string()))


def cosine_topk_brute(query_mat: np.ndarray, k: int):
    """Factory for a brute-force cosine top-k map_batches stage: each
    batch's embeddings (N,D) are scored against the broadcast query
    matrix (Q,D) with one matmul; emits per-batch partial top-k that a
    small driver-side merge finalizes (baseline ANN; see
    stages/similarity.py for the LSH-bucketed scale path)."""
    qn = query_mat / np.maximum(np.linalg.norm(query_mat, axis=1, keepdims=True), 1e-12)

    def score(batch: pa.Table) -> pa.Table:
        emb = embeddings_to_ndarray(batch.column("embedding"))
        ids = batch.column("vec_id").to_pylist()
        en = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        sims = en @ qn.T  # (N, Q)
        n = sims.shape[0]
        kk = min(k, n)
        out_q, out_id, out_sim = [], [], []
        # boundary-tie widening: keep all rows tied with the kk-th
        # largest sim so the downstream deterministic merge decides
        bound = np.partition(sims, n - kk, axis=0)[n - kk, :]
        for q in range(qn.shape[0]):
            idx = np.flatnonzero(sims[:, q] >= bound[q])
            for i in idx:
                out_q.append(q)
                out_id.append(ids[int(i)])
                out_sim.append(float(sims[int(i), q]))
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_id, pa.int64()),
            "sim": pa.array(out_sim, pa.float64()),
        })

    return score
