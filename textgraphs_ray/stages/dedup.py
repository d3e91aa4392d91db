"""Deduplication family for training-data pipelines.

Five operators, all built from the same primitives the ER chain uses
(hash partition, MinHash/LSH bands, label propagation):

- :func:`exact_dedup` — hash-partition + per-group first (the J1
  pattern on content hashes);
- :func:`minhash_dedup` — shingle → minhash → band → bucket groupby →
  pair dedup → DISTRIBUTED Jaccard verification → connected
  components;
- :func:`simhash_dedup` — 64-bit SimHash, banded into 4×16-bit chunks
  (Hamming ≤ 3 guaranteed to collide on ≥1 chunk), verified by
  Hamming distance;
- :func:`ngram_jaccard_dedup` — banding for candidates, exact n-gram
  Jaccard as the verifier;
- :func:`embedding_dedup` — random-hyperplane LSH buckets over an
  embedding column, cosine-verified pairs.

The verification stage is a ``map_batches`` over the pair stream —
never a driver-side loop — and pairs are deduped (groupby on the pair
key) before verification so each distinct pair is verified once no
matter how many bands it collides in.  Pair generation within buckets
is capped (sorted-neighbor window) exactly like ER blocking: skew-safe.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Min, Sum

from ..functions.sketch import (band_keys, hamming64, jaccard_shingles,
                                minhash_batch, simhash_batch)
from ..functions.strsim import cosine_batch
from ..functions.vec import embeddings_to_ndarray
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
        return df.groupby("fp", as_index=False).agg(
            n_dups=(id_col, "size"), keeper=(id_col, "min"))

    partial = ds.map_batches(add_fp, batch_format="pyarrow")
    return partial.groupby("fp").aggregate(
        Min("keeper", alias_name="keeper"),
        Sum("n_dups", alias_name="n_dups"),
    )


def _bucket_pairs_partition(g: pd.DataFrame) -> pd.DataFrame:
    """Vectorized candidate pairs across every LSH bucket in one coarse
    partition (same pattern as blocking._pairs_for_partition)."""
    from .blocking import segmented_pair_indices

    g = (g.drop_duplicates(["band_id", "band_hash", "id"])
         .sort_values(["band_id", "band_hash", "id"], kind="stable"))
    sizes = g.groupby(["band_id", "band_hash"], sort=False).size().to_numpy()
    ids = g["id"].to_numpy()
    payload = g["payload"].to_numpy()
    iu, ju = segmented_pair_indices(sizes, cap=2 * PAIR_CAP_WINDOW,
                                    window=PAIR_CAP_WINDOW)
    ia, ib = ids[iu], ids[ju]
    keep = ia != ib
    return pd.DataFrame({
        "id_a": ia[keep], "id_b": ib[keep],
        "payload_a": payload[iu][keep], "payload_b": payload[ju][keep],
    })


def _dedup_pairs(pairs: "ray.data.Dataset") -> "ray.data.Dataset":
    """One row per distinct (id_a, id_b) — groupby-aggregate, no
    per-group Python (payloads are functions of the ids)."""
    import pyarrow.compute as pc

    def add_key(t: pa.Table) -> pa.Table:
        pk = pc.binary_join_element_wise(
            pc.cast(t.column("id_a"), pa.string()),
            pc.cast(t.column("id_b"), pa.string()), "\x1f")
        return t.append_column("pair_key", pk)

    return (pairs.map_batches(add_key, batch_format="pyarrow")
            .groupby("pair_key")
            .aggregate(Min("id_a", alias_name="id_a"),
                       Min("id_b", alias_name="id_b"),
                       Min("payload_a", alias_name="payload_a"),
                       Min("payload_b", alias_name="payload_b"))
            .drop_columns(["pair_key"]))


def _pairs_to_clusters(ids_ds, verified_pairs: "ray.data.Dataset",
                       *, id_col: str) -> "ray.data.Dataset":
    """Verified pair Dataset → connected components over all ids."""
    import pyarrow.compute as pc

    nodes = ids_ds.map_batches(
        lambda t: pa.table({"key": pc.cast(t.column(id_col), pa.string())}),
        batch_format="pyarrow")
    edges = verified_pairs.map_batches(
        lambda t: pa.table({
            "key_a": pc.cast(t.column("id_a"), pa.string()),
            "key_b": pc.cast(t.column("id_b"), pa.string())}),
        batch_format="pyarrow")
    return propagate_labels(nodes, edges, num_partitions=8)


def _banded_candidates(ds, bander, concurrency,
                       dedup_pairs: bool = False,
                       mask_fn=None) -> "ray.data.Dataset":
    """Banded rows → candidate pair stream.

    ``dedup_pairs=False`` skips the pair-key sort shuffle: a pair
    colliding in several bands is verified once per collision, which is
    cheaper than an extra all-to-all when verification is a vectorized
    kernel (signature/Hamming/cosine).  Pass ``True`` when the verifier
    is per-pair Python (exact shingle Jaccard) so each distinct pair is
    verified exactly once.  Connected components are duplicate-edge
    insensitive either way.

    ``mask_fn(payload_a, payload_b) -> bool mask`` fuses verification
    INTO the pair-generation group task: candidate pairs carry two
    full payloads each (a 64-perm signature is 512 B, an embedding
    more), so emitting then re-reading the raw pair stream costs
    ~1 KB × pairs of object-store traffic; verifying in place emits
    only the accepted (id_a, id_b) rows — the payload never leaves
    the task that built the pair.

    ``bander`` may be a callable instance (stateless → task-based map,
    ``concurrency=None``; no actor-pool ramp-up) or a class (stateful →
    actor pool sized by ``concurrency``).
    """
    from .blocking import PAIR_PARTITIONS

    kwargs = {} if concurrency is None else {"concurrency": concurrency}
    banded = ds.map_batches(bander, batch_format="pyarrow", **kwargs)

    def add_part(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        part = pc.cast(
            pc.bit_wise_and(t.column("band_hash"),
                            pa.scalar(PAIR_PARTITIONS - 1, pa.uint64())),
            pa.int32())
        return t.append_column("part", part)

    parted = banded.map_batches(add_part, batch_format="pyarrow")

    if mask_fn is not None and not dedup_pairs:
        def gen_and_verify(g: pd.DataFrame) -> pd.DataFrame:
            pairs_df = _bucket_pairs_partition(g)
            if not len(pairs_df):
                return pairs_df[["id_a", "id_b"]]
            m = mask_fn(pairs_df["payload_a"].to_numpy(),
                        pairs_df["payload_b"].to_numpy())
            return pairs_df.loc[m, ["id_a", "id_b"]]

        return parted.groupby("part").map_groups(gen_and_verify,
                                                 batch_format="pandas")

    pairs = parted.groupby("part").map_groups(_bucket_pairs_partition,
                                              batch_format="pandas")
    return _dedup_pairs(pairs) if dedup_pairs else pairs


def minhash_dedup(ds: "ray.data.Dataset", *, text_col: str = "text",
                  id_col: str = "doc_id", num_perm: int = 64,
                  bands: int = 16, jaccard_threshold: float = 0.7,
                  concurrency=None) -> "ray.data.Dataset":
    """MinHash-LSH near-dedup → clusters(key=id, cluster_id).

    Verification is the standard signature-estimated Jaccard (fraction
    of equal minhash components, std ≈ 1/√P) — one vectorized
    comparison per pair batch, no per-pair Python; the exact-shingle
    verifier lives in :func:`ngram_jaccard_dedup`.
    """

    class Bander:
        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = [str(v) for v in batch.column(id_col).to_pylist()]
            texts = [(t or "") for t in batch.column(text_col).to_pylist()]
            sigs = minhash_batch(texts, num_perm=num_perm)
            bh = band_keys(sigs, bands=bands)
            n = len(ids)
            sig_bytes = [s.tobytes() for s in sigs]
            return pa.table({
                "band_id": pa.array(
                    np.tile(np.arange(bands, dtype=np.int32), n)),
                "band_hash": pa.array(bh.ravel(), pa.uint64()),
                "id": pa.array(np.repeat(np.asarray(ids, object), bands),
                               pa.string()),
                "payload": pa.array(np.repeat(
                    np.asarray(sig_bytes, object), bands), pa.binary()),
            })

    def sig_mask(pa_buf: np.ndarray, pb_buf: np.ndarray) -> np.ndarray:
        sa = np.stack([np.frombuffer(b, dtype=np.uint64) for b in pa_buf])
        sb = np.stack([np.frombuffer(b, dtype=np.uint64) for b in pb_buf])
        return (sa == sb).mean(axis=1) >= jaccard_threshold

    verified = _banded_candidates(ds, Bander(), concurrency,
                                  mask_fn=sig_mask)
    return _pairs_to_clusters(ds, verified, id_col=id_col)


def simhash_dedup(ds: "ray.data.Dataset", *, text_col: str = "text",
                  id_col: str = "doc_id", max_hamming: int = 3,
                  concurrency=None) -> "ray.data.Dataset":
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
                "payload": pa.array(np.repeat(sh.astype(np.uint64), 4),
                                    pa.uint64()),
            })

    def ham_mask(pa_buf: np.ndarray, pb_buf: np.ndarray) -> np.ndarray:
        ham = hamming64(pa_buf.astype(np.uint64), pb_buf.astype(np.uint64))
        return ham <= max_hamming

    verified = _banded_candidates(ds, Bander(), concurrency,
                                  mask_fn=ham_mask)
    return _pairs_to_clusters(ds, verified, id_col=id_col)


def ngram_jaccard_dedup(ds: "ray.data.Dataset", *, text_col: str = "text",
                        id_col: str = "doc_id", num_perm: int = 64,
                        bands: int = 16, threshold: float = 0.8,
                        concurrency=None) -> "ray.data.Dataset":
    """Exact n-gram Jaccard dedup: MinHash banding for candidates,
    EXACT shingle-set Jaccard as the verifier.  The verifier is a
    per-pair set kernel, so the pair stream IS deduped first — each
    distinct candidate pair pays the exact verification exactly once.
    """

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

    def verify(t: pa.Table) -> pa.Table:
        jac = np.fromiter(
            (jaccard_shingles(a, b)
             for a, b in zip(t.column("payload_a").to_pylist(),
                             t.column("payload_b").to_pylist())),
            dtype=np.float64, count=t.num_rows)
        return t.filter(pa.array(jac >= threshold))

    candidates = _banded_candidates(ds, Bander(), concurrency,
                                    dedup_pairs=True)
    verified = candidates.map_batches(verify, batch_format="pyarrow",
                                      batch_size=4096)
    return _pairs_to_clusters(ds, verified, id_col=id_col)


def embedding_dedup(ds: "ray.data.Dataset", *, emb_col: str = "embedding",
                    id_col: str = "vec_id", cosine_threshold: float = 0.9,
                    planes: int = 12, bands: int = 4, seed: int = 42,
                    concurrency=(1, 4)) -> "ray.data.Dataset":
    """Embedding-cosine near-dup: multi-band random-hyperplane LSH then
    distributed cosine verification.  ``bands`` independent plane sets
    give recall 1-(1-p^planes)^bands for per-plane agreement p — one
    band of 12 planes catches ~p^12 only; four bands close most of the
    gap at 4× banding volume.  The plane tensor is built once per
    actor."""

    class Bander:
        def __init__(self) -> None:
            self.planes = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = [str(v) for v in batch.column(id_col).to_pylist()]
            emb = embeddings_to_ndarray(batch.column(emb_col))
            if self.planes is None:
                rng = np.random.RandomState(seed)
                self.planes = rng.standard_normal(
                    (bands, emb.shape[1], planes)).astype(np.float32)
            n = len(ids)
            pow2 = 1 << np.arange(planes, dtype=np.int64)
            buckets = np.empty((n, bands), dtype=np.uint64)
            for b in range(bands):
                bits = (emb @ self.planes[b]) > 0
                # salt the bucket id with the band index so different
                # bands never share hash space
                buckets[:, b] = (bits @ pow2).astype(np.uint64) \
                    ^ np.uint64(0x9E3779B97F4A7C15 * (b + 1) & (2**64 - 1))
            payload = [e.tobytes() for e in emb]
            return pa.table({
                "band_id": pa.array(
                    np.tile(np.arange(bands, dtype=np.int32), n)),
                "band_hash": pa.array(buckets.ravel(), pa.uint64()),
                "id": pa.array(np.repeat(np.asarray(ids, object), bands),
                               pa.string()),
                "payload": pa.array(np.repeat(
                    np.asarray(payload, object), bands), pa.binary()),
            })

    def cos_mask(pa_buf: np.ndarray, pb_buf: np.ndarray) -> np.ndarray:
        ea = np.stack([np.frombuffer(b, dtype=np.float32) for b in pa_buf])
        eb = np.stack([np.frombuffer(b, dtype=np.float32) for b in pb_buf])
        return cosine_batch(ea, eb) >= cosine_threshold

    verified = _banded_candidates(ds, Bander, concurrency,
                                  mask_fn=cos_mask)
    return _pairs_to_clusters(ds, verified, id_col=id_col)


#: above this many distinct duplicated hashes the dup set stops being
#: a driver broadcast and becomes a hash-partitioned semi-join
DUP_BROADCAST_MAX = 5_000_000


def chunk_dedup(ds: "ray.data.Dataset", *, text_col: str = "text",
                id_col: str = "doc_id", words_per_chunk: int = 20,
                min_count: int = 2, concurrency=None,
                dup_broadcast_max: int = DUP_BROADCAST_MAX,
                num_partitions: int = 64) -> "ray.data.Dataset":
    """Corpus-wide duplicated-span removal → (doc_id, text_dedup,
    n_chunks, n_dropped).

    The line/paragraph dedup step of web-corpus curation (RefinedWeb /
    CCNet drop every line that repeats across the corpus), generalized
    to deterministic word windows so it applies to unsegmented text:
    each document is cut into consecutive ``words_per_chunk``-word
    chunks (last chunk may be short), every occurrence of any chunk
    whose corpus-wide frequency is ≥ ``min_count`` is stripped, and
    the surviving chunks are reassembled in order (whitespace
    normalized to single spaces — same canonical form both passes use).

    Pass 1 (always): count — per-batch ``np.unique`` combiner emits
    (chunk_hash, partial_count); one groupby-sum; only hashes with
    count ≥ ``min_count`` survive.  The strip pass then has two
    physical plans, switched on the measured dup-set size
    (``dup_broadcast_max``):

    - **broadcast** (dup set dup-rate-bounded, the common case): the
      sorted hash array ships once via ``ray.put``; one stateless
      re-chunk + ``np.isin`` + reassemble pass, no joins.
    - **join** (extreme dup rates / 10^12-doc corpora where even the
      distinct-dup set outgrows a broadcast): docs explode to
      (doc_id, pos, chunk_hash) triples — 24-byte rows, never chunk
      text — that semi-join the dup table on the hash
      (:func:`..stages.join.shuffle_join`, empty-partition-safe);
      the surviving dup POSITIONS join back to the documents on
      ``doc_id`` and a per-doc group reduce re-chunks and reassembles.
      The text rides exactly one exchange; the vocabulary-sized hash
      table never visits the driver.

    Chunk identity is the 64-bit content hash (``sketch.hash64``), so
    the shuffles move 8-byte keys, never chunk text.  Both plans are
    output-identical (parity pinned in tests).  Force the join plan
    with ``dup_broadcast_max=0``.
    """
    from ..functions.sketch import hash64

    w = words_per_chunk

    def _chunks_of(texts: list) -> tuple[list, np.ndarray]:
        """All chunk strings of a batch + per-doc chunk counts."""
        flat: list = []
        counts = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            words = (t or "").split()
            cs = [" ".join(words[j: j + w])
                  for j in range(0, len(words), w)]
            counts[i] = len(cs)
            flat.extend(cs)
        return flat, counts

    def count_partial(batch: pa.Table) -> pa.Table:
        flat, _ = _chunks_of(batch.column(text_col).to_pylist())
        # int64 bit-view: uint64 values ≥ 2^63 don't survive Ray's
        # aggregate block re-batching (Arrow int64 overflow → pickled
        # fallback); equality is all that matters here.
        h = hash64(flat).view(np.int64)
        uniq, cnt = np.unique(h, return_counts=True)
        return pa.table({"h": pa.array(uniq, pa.int64()),
                         "n": pa.array(cnt, pa.int64())})

    counts = (ds.map_batches(count_partial, batch_format="pyarrow")
              .groupby("h").aggregate(Sum("n", alias_name="count")))
    dup_ds = counts.map_batches(
        lambda t: t.filter(
            pa.compute.greater_equal(t.column("count"), min_count))
        .select(["h"]),
        batch_format="pyarrow").materialize()

    if dup_ds.count() <= dup_broadcast_max:
        dup = np.sort(np.array([r["h"] for r in dup_ds.take_all()],
                               dtype=np.int64))
        dup_ref = ray.put(dup)

        def strip(batch: pa.Table) -> pa.Table:
            dup_set = ray.get(dup_ref)
            texts = batch.column(text_col).to_pylist()
            flat, n_chunks = _chunks_of(texts)
            h = hash64(flat).view(np.int64)
            is_dup = (np.zeros(len(flat), dtype=bool) if not dup_set.size
                      else np.isin(h, dup_set))
            bounds = np.concatenate(([0], np.cumsum(n_chunks)))
            out_text, n_dropped = [], np.zeros(len(texts), dtype=np.int64)
            for i in range(len(texts)):
                lo, hi = bounds[i], bounds[i + 1]
                keep = [flat[j] for j in range(lo, hi) if not is_dup[j]]
                n_dropped[i] = (hi - lo) - len(keep)
                out_text.append(" ".join(keep))
            return pa.table({
                id_col: batch.column(id_col),
                "text_dedup": pa.array(out_text, pa.string()),
                "n_chunks": pa.array(n_chunks, pa.int64()),
                "n_dropped": pa.array(n_dropped, pa.int64()),
            })

        kwargs = {"concurrency": concurrency} if concurrency else {}
        return ds.map_batches(strip, batch_format="pyarrow", **kwargs)

    # join plan: dup set too big to broadcast
    from .join import shuffle_join

    def chunk_rows(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        flat, n_chunks = _chunks_of(texts)
        h = hash64(flat).view(np.int64)
        ends = np.cumsum(n_chunks)
        pos = (np.arange(int(ends[-1]) if len(ends) else 0,
                         dtype=np.int64)
               - np.repeat(ends - n_chunks, n_chunks))
        return pa.table({
            "_did": pa.array(np.repeat(ids, n_chunks)),
            "pos": pa.array(pos, pa.int64()),
            "h": pa.array(h, pa.int64()),
        })

    chunks = ds.map_batches(chunk_rows, batch_format="pyarrow")
    dup_pos = shuffle_join(chunks, dup_ds, "h", "h", num_partitions,
                           how="semi")
    docs = ds.map_batches(lambda t: t.select([id_col, text_col]),
                          batch_format="pyarrow")
    joined = shuffle_join(
        docs, dup_pos, id_col, "_did", num_partitions,
        project=lambda m: m[[id_col, text_col, "pos"]], how="left")

    def regroup(g: pd.DataFrame) -> pd.DataFrame:
        text = g[text_col].iloc[0]
        words = (text or "").split()
        cs = [" ".join(words[j: j + w]) for j in range(0, len(words), w)]
        dup_at = set(int(p) for p in g["pos"].dropna())
        keep = [c for i, c in enumerate(cs) if i not in dup_at]
        return pd.DataFrame({
            id_col: [g[id_col].iloc[0]],
            "text_dedup": [" ".join(keep)],
            "n_chunks": np.array([len(cs)], np.int64),
            "n_dropped": np.array([len(dup_at)], np.int64)})

    return joined.groupby(id_col).map_groups(regroup,
                                             batch_format="pandas")


def substring_dedup(ds: "ray.data.Dataset", *, text_col: str = "text",
                    id_col: str = "doc_id", window: int = 10,
                    min_count: int = 2, concurrency=None,
                    dup_broadcast_max: int = DUP_BROADCAST_MAX,
                    num_partitions: int = 64) -> "ray.data.Dataset":
    """ExactSubstr-style repeated-substring removal → (doc_id,
    text_dedup, n_tokens, n_removed).

    The token-level counterpart of Lee et al.'s suffix-array substring
    dedup, approximated with stride-1 rolling windows: every word
    ``window``-gram occurring ≥ ``min_count`` times corpus-wide marks
    ALL tokens of ALL its occurrences as covered; maximal uncovered
    runs are reassembled in order.  A duplicated span of L ≥ window
    tokens yields L−window+1 duplicated windows whose coverage is
    exactly the span — so repeated spans of any length ≥ ``window``
    are removed in full, the same guarantee the suffix array gives,
    without a global sort.  Unlike :func:`chunk_dedup` (aligned
    non-overlapping windows) this catches repeats at ANY offset.

    Same two-plan streaming shape as :func:`chunk_dedup`: a per-batch
    ``np.unique`` combiner feeds one groupby-sum; below
    ``dup_broadcast_max`` the duplicated window hashes broadcast once
    (dup-rate-bounded, the common case) and the strip pass recomputes
    window hashes (vectorized polynomial over the flat token-hash
    stream, ``decontam._gram_hashes_flat``) and marks coverage with a
    difference array — one cumsum for the whole batch.  Above it, docs
    explode to (doc_id, win_pos, gram_hash) triples that semi-join the
    dup table on the hash, dup positions join back on ``doc_id``, and
    a per-doc group reduce rebuilds coverage — the 10^12-doc plan
    where even the distinct-dup set outgrows a broadcast (force with
    ``dup_broadcast_max=0``; parity pinned in tests).
    """
    from .decontam import _WS, _gram_hashes_flat

    def count_partial(batch: pa.Table) -> pa.Table:
        gh, _ = _gram_hashes_flat(batch.column(text_col).to_pylist(),
                                  window)
        uniq, cnt = np.unique(gh.view(np.int64), return_counts=True)
        return pa.table({"h": pa.array(uniq, pa.int64()),
                         "n": pa.array(cnt, pa.int64())})

    counts = (ds.map_batches(count_partial, batch_format="pyarrow")
              .groupby("h").aggregate(Sum("n", alias_name="count")))
    dup_ds = counts.map_batches(
        lambda t: t.filter(
            pa.compute.greater_equal(t.column("count"), min_count))
        .select(["h"]),
        batch_format="pyarrow").materialize()

    if dup_ds.count() > dup_broadcast_max:
        return _substring_strip_joined(
            ds, dup_ds, text_col=text_col, id_col=id_col, window=window,
            num_partitions=num_partitions)

    dup = np.sort(np.array([r["h"] for r in dup_ds.take_all()],
                           dtype=np.int64))
    dup_ref = ray.put(dup)

    def strip(batch: pa.Table) -> pa.Table:
        dup_set = ray.get(dup_ref)
        texts = batch.column(text_col).to_pylist()
        words_per_doc = [_WS.split(t.strip()) if t else [] for t in texts]
        lens = np.fromiter((len(w) for w in words_per_doc), np.int64,
                           count=len(texts))
        bounds = np.concatenate(([0], np.cumsum(lens)))
        total = int(bounds[-1])
        gh, doc_idx = _gram_hashes_flat(texts, window)
        # window start positions in the FLAT token stream: valid
        # windows of doc d are the first len_d-window+1 flat positions
        # of d, in order — recover them from the per-doc window counts
        delta = np.zeros(total + 1, dtype=np.int64)
        if len(gh) and dup_set.size:
            is_dup = np.isin(gh.view(np.int64), dup_set)
            n_win = np.maximum(lens - window + 1, 0)
            win_starts = (np.arange(len(gh))
                          - np.repeat(np.cumsum(
                              np.concatenate(([0], n_win[:-1]))), n_win)
                          + np.repeat(bounds[:-1], n_win))
            s = win_starts[is_dup]
            np.add.at(delta, s, 1)
            np.add.at(delta, s + window, -1)
        covered = np.cumsum(delta[:-1]) > 0
        out_text, n_removed = [], np.zeros(len(texts), dtype=np.int64)
        for i, words in enumerate(words_per_doc):
            lo, hi = bounds[i], bounds[i + 1]
            cov = covered[lo:hi]
            n_removed[i] = int(cov.sum())
            out_text.append(" ".join(
                w for w, c in zip(words, cov) if not c))
        return pa.table({
            id_col: batch.column(id_col),
            "text_dedup": pa.array(out_text, pa.string()),
            "n_tokens": pa.array(lens, pa.int64()),
            "n_removed": pa.array(n_removed, pa.int64()),
        })

    kwargs = {"concurrency": concurrency} if concurrency else {}
    return ds.map_batches(strip, batch_format="pyarrow", **kwargs)


def _substring_strip_joined(ds: "ray.data.Dataset",
                            dup_ds: "ray.data.Dataset", *, text_col: str,
                            id_col: str, window: int,
                            num_partitions: int) -> "ray.data.Dataset":
    """:func:`substring_dedup`'s join plan: (doc_id, win_pos, hash)
    triples semi-join the dup table, positions join back on doc_id, a
    per-doc group reduce rebuilds the coverage difference array.  Only
    24-byte triples and the doc text (once) ride the exchanges."""
    from .decontam import _WS, _gram_hashes_flat
    from .join import shuffle_join

    def gram_rows(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        gh, di = _gram_hashes_flat(texts, window)
        counts = np.bincount(di, minlength=len(texts)) if len(gh) \
            else np.zeros(len(texts), np.int64)
        ends = np.cumsum(counts)
        pos = (np.arange(len(gh), dtype=np.int64)
               - np.repeat(ends - counts, counts))
        return pa.table({
            "_did": pa.array(np.repeat(ids, counts)),
            "pos": pa.array(pos, pa.int64()),
            "h": pa.array(gh.view(np.int64), pa.int64()),
        })

    grams = ds.map_batches(gram_rows, batch_format="pyarrow")
    dup_pos = shuffle_join(grams, dup_ds, "h", "h", num_partitions,
                           how="semi")
    docs = ds.map_batches(lambda t: t.select([id_col, text_col]),
                          batch_format="pyarrow")
    joined = shuffle_join(
        docs, dup_pos, id_col, "_did", num_partitions,
        project=lambda m: m[[id_col, text_col, "pos"]], how="left")

    def regroup(g: pd.DataFrame) -> pd.DataFrame:
        text = g[text_col].iloc[0]
        words = _WS.split(text.strip()) if text else []
        n = len(words)
        pos = g["pos"].dropna().to_numpy(np.int64)
        delta = np.zeros(n + window + 1, dtype=np.int64)
        np.add.at(delta, pos, 1)
        np.add.at(delta, pos + window, -1)
        covered = np.cumsum(delta[:n]) > 0 if n else \
            np.zeros(0, dtype=bool)
        return pd.DataFrame({
            id_col: [g[id_col].iloc[0]],
            "text_dedup": [" ".join(
                w for w, c in zip(words, covered) if not c)],
            "n_tokens": np.array([n], np.int64),
            "n_removed": np.array([int(covered.sum())], np.int64)})

    return joined.groupby(id_col).map_groups(regroup,
                                             batch_format="pandas")


def semantic_dedup(ds: "ray.data.Dataset", *, emb_col: str = "embedding",
                   id_col: str = "vec_id", cosine_threshold: float = 0.95,
                   ncells: int = 16, train: str = "sample",
                   sample_size: int = 4096, seed: int = 42,
                   concurrency=None) -> "ray.data.Dataset":
    """SemDeDup-style semantic near-dedup → clusters(key, cluster_id).

    Same verify/closure machinery as :func:`embedding_dedup`, but the
    blocking is DATA-ADAPTIVE: k-means cells learned from the corpus
    (bounded sample, or full-data distributed Lloyd's with
    ``train="distributed"``) instead of random hyperplanes.  Learned
    cells concentrate semantically-close vectors into the same bucket,
    so recall at a given candidate budget tracks the corpus geometry —
    the SemDeDup observation that semantic duplicates land in the same
    k-means cluster.  Keeper convention (min id per component) matches
    the rest of the dedup family.
    """
    from .similarity import (_normalize, kmeans_centroids,
                             kmeans_distributed)

    if train == "distributed":
        cent = kmeans_distributed(ds, ncells, emb_col=emb_col,
                                  sample_size=sample_size, seed=seed)
    else:
        sample = np.asarray(
            [r[emb_col] for r in ds.limit(sample_size).take_all()],
            dtype=np.float32)
        cent = (kmeans_centroids(sample, ncells, seed=seed)
                if len(sample) else np.zeros((0, 0), np.float32))
    if cent.size == 0:
        # empty input: every id is its own cluster (no centroids to
        # block with, nothing to pair)
        return ds.map_batches(
            lambda t: pa.table({
                "key": pa.compute.cast(t.column(id_col), pa.string()),
                "cluster_id": pa.compute.cast(t.column(id_col),
                                              pa.string())}),
            batch_format="pyarrow")
    cent_ref = ray.put(cent)

    class Bander:
        def __init__(self) -> None:
            self.cent = ray.get(cent_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = [str(v) for v in batch.column(id_col).to_pylist()]
            emb = embeddings_to_ndarray(batch.column(emb_col))
            en = _normalize(emb)
            cell = np.argmax(en @ self.cent.T, axis=1).astype(np.uint64)
            payload = [e.tobytes() for e in en]
            return pa.table({
                "band_id": pa.array(np.zeros(len(ids), dtype=np.int32)),
                "band_hash": pa.array(cell, pa.uint64()),
                "id": pa.array(ids, pa.string()),
                "payload": pa.array(payload, pa.binary()),
            })

    def cos_mask(pa_buf: np.ndarray, pb_buf: np.ndarray) -> np.ndarray:
        ea = np.stack([np.frombuffer(b, dtype=np.float32) for b in pa_buf])
        eb = np.stack([np.frombuffer(b, dtype=np.float32) for b in pb_buf])
        return cosine_batch(ea, eb) >= cosine_threshold

    verified = _banded_candidates(ds, Bander, concurrency or (1, 4),
                                  mask_fn=cos_mask)
    return _pairs_to_clusters(ds, verified, id_col=id_col)
