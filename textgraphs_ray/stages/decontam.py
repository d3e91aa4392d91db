"""Benchmark n-gram decontamination — flag training documents that
share any word n-gram with a held-out benchmark/eval set.

The standard LLM-training-data hygiene pass (the reference engine has
no counterpart; this is one of the beyond-reference curation operators
alongside ``stages/dedup.py`` and ``pipelines/curate.py``):

1. **Build** — stream the (small) benchmark corpus once and collect the
   distinct 64-bit hashes of its word n-grams.  Benchmark sets are eval
   suites, orders of magnitude smaller than the training corpus, so the
   distinct-hash array fits in one object-store object (10^7 grams =
   80 MB).  It is ``ray.put`` once and read zero-copy by every actor —
   never re-shipped per batch.  (At extreme benchmark sizes the same
   interface can hand the actors a Bloom filter instead; the membership
   test below is already isolated in one place.)
2. **Scan** — one ``map_batches`` pass over the training corpus.  Per
   batch: tokenize, hash every word once (vectorized fixed-key siphash,
   ``functions/sketch.hash64``), combine the hashes of each length-``n``
   window with a positional polynomial (pure numpy sliding windows —
   no per-gram string joins), and count benchmark membership with one
   ``searchsorted`` against the sorted hash array.  No shuffle at all:
   the whole operator is embarrassingly parallel after the broadcast.

Membership is by 64-bit hash on both sides, so two distinct grams can
collide with probability ~``B*G / 2^64`` (B = benchmark grams, G = doc
grams) — negligible at any realistic scale and irrelevant for the
contamination decision.  The DuckDB oracle (``oracle_sql()
["decontaminate"]``) compares exact gram strings; agreement of the two
is itself evidence the hash path is collision-free on the test corpus.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..functions.sketch import hash64

from ..functions.rounding import round_half_away

_WS = re.compile(r"\s+")
# odd multiplier for the positional combine (FNV-1a prime); windows are
# combined as sum_j h(w[i+j]) * P^j mod 2^64 — order-sensitive, one
# vectorized multiply-add over a numpy sliding window view
_P = np.uint64(0x100000001B3)


def _gram_hashes_flat(texts: list, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Word n-gram hashes for a batch of strings.

    Returns ``(gram_hash, doc_idx)`` — one entry per gram *occurrence*
    (not distinct), where ``doc_idx[i]`` is the row the gram came from.
    Tokenization matches the SQL oracle: split the trimmed text on
    ``\\s+``; rows with fewer than ``n`` tokens contribute no grams.
    """
    words_per_doc = [_WS.split(t.strip()) if t else [] for t in texts]
    lens = np.fromiter((len(w) for w in words_per_doc), np.int64,
                       count=len(words_per_doc))
    total = int(lens.sum())
    if total < n:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    flat = [w for ws in words_per_doc for w in ws]
    flat_h = hash64(flat)
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
    powers = _P ** np.arange(n, dtype=np.uint64)  # wraps mod 2^64
    win = np.lib.stride_tricks.sliding_window_view(flat_h, n)
    gram_h = (win * powers).sum(axis=1, dtype=np.uint64)
    # a window starting at position s is a real gram only if it does not
    # cross a document boundary: same row at its first and last word
    valid = doc_idx[: total - n + 1] == doc_idx[n - 1:]
    return gram_h[valid], doc_idx[: total - n + 1][valid]


def benchmark_gram_hashes(bench_ds: "ray.data.Dataset", *, n: int = 8,
                          text_col: str = "text") -> np.ndarray:
    """Distinct n-gram hashes of the benchmark corpus (sorted uint64).

    Streams the benchmark through ``map_batches`` (per-batch distinct
    first, so only unique hashes per block reach the driver) and merges
    on the driver — bounded by the benchmark's distinct-gram count,
    which is small by construction (it is the *eval* set)."""

    def per_batch(t: pa.Table) -> pa.Table:
        gh, _ = _gram_hashes_flat(t.column(text_col).to_pylist(), n)
        return pa.table({"gram_hash": np.unique(gh)})

    parts = bench_ds.map_batches(per_batch, batch_format="pyarrow")
    arrs = [b["gram_hash"] for b in parts.iter_batches(batch_format="numpy")
            if len(b["gram_hash"])]
    if not arrs:
        return np.zeros(0, np.uint64)
    return np.unique(np.concatenate(arrs))


class Decontaminator:
    """Actor-pool stage: append ``n_hits`` (gram occurrences found in
    the benchmark set) and ``contaminated`` (0/1) to each row.

    The sorted benchmark hash array is fetched from the object store
    once per actor (``__init__``), then every batch is one vectorized
    hash + ``searchsorted`` pass."""

    def __init__(self, hashes_ref, *, n: int = 8,
                 text_col: str = "text") -> None:
        h = (ray.get(hashes_ref)
             if isinstance(hashes_ref, ray.ObjectRef) else hashes_ref)
        self.sorted_h = np.sort(np.asarray(h, dtype=np.uint64))
        self.n = n
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        gram_h, doc_idx = _gram_hashes_flat(texts, self.n)
        n_hits = np.zeros(len(texts), np.int64)
        if len(gram_h) and len(self.sorted_h):
            pos = np.searchsorted(self.sorted_h, gram_h)
            pos[pos == len(self.sorted_h)] = len(self.sorted_h) - 1
            hit = self.sorted_h[pos] == gram_h
            n_hits = np.bincount(doc_idx[hit],
                                 minlength=len(texts)).astype(np.int64)
        return (batch.append_column("n_hits", pa.array(n_hits))
                .append_column("contaminated",
                               pa.array((n_hits > 0).astype(np.int64))))


def decontaminate(docs_ds: "ray.data.Dataset",
                  bench_ds: "ray.data.Dataset", *, n: int = 8,
                  text_col: str = "text",
                  concurrency=(1, 8)) -> "ray.data.Dataset":
    """Flag every training row sharing a word n-gram with ``bench_ds``.

    Build-once broadcast + single stateless scan; see module docstring
    for the scale argument."""
    hashes = benchmark_gram_hashes(bench_ds, n=n, text_col=text_col)
    ref = ray.put(hashes)
    return docs_ds.map_batches(
        Decontaminator, batch_format="pyarrow", concurrency=concurrency,
        fn_constructor_args=(ref,),
        fn_constructor_kwargs={"n": n, "text_col": text_col})


class ContaminationFraction(Decontaminator):
    """Per-document contaminated-gram FRACTION — the graded form of
    :class:`Decontaminator` (GPT-3-style decontamination reports and
    thresholded filtering need the ratio, not just the any-hit flag).
    Same broadcast + one vectorized pass; both the gram census and the
    hit count come from the single ``_gram_hashes_flat`` call.  Rows
    with fewer than ``n`` tokens have no grams and are dropped (the
    fraction is undefined), matching the SQL oracle's inner gram
    census."""

    def __init__(self, hashes_ref, *, n: int = 8,
                 text_col: str = "text",
                 id_col: str = "doc_id") -> None:
        super().__init__(hashes_ref, n=n, text_col=text_col)
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        gram_h, doc_idx = _gram_hashes_flat(texts, self.n)
        n_grams = np.bincount(doc_idx,
                              minlength=len(texts)).astype(np.int64)
        n_hits = np.zeros(len(texts), np.int64)
        if len(gram_h) and len(self.sorted_h):
            pos = np.searchsorted(self.sorted_h, gram_h)
            pos[pos == len(self.sorted_h)] = len(self.sorted_h) - 1
            hit = self.sorted_h[pos] == gram_h
            n_hits = np.bincount(doc_idx[hit],
                                 minlength=len(texts)).astype(np.int64)
        keep = n_grams > 0
        ids = batch.column(self.id_col).to_numpy(
            zero_copy_only=False)[keep]
        ng = n_grams[keep]
        nh = n_hits[keep]
        return pa.table({
            self.id_col: pa.array(ids),
            "n_grams": pa.array(ng),
            "n_hits": pa.array(nh),
            # integer ratio -> half-away 6dp (repo invariant)
            "frac": pa.array(round_half_away(nh / ng, 6))})


def contamination_fraction(docs_ds: "ray.data.Dataset",
                           bench_ds: "ray.data.Dataset", *, n: int = 8,
                           text_col: str = "text",
                           id_col: str = "doc_id",
                           concurrency=(1, 8)) -> "ray.data.Dataset":
    """→ (id, n_grams, n_hits, frac): fraction of each training row's
    word n-grams present in the benchmark set — build-once broadcast +
    single stateless scan, like :func:`decontaminate`."""
    hashes = benchmark_gram_hashes(bench_ds, n=n, text_col=text_col)
    ref = ray.put(hashes)
    return docs_ds.map_batches(
        ContaminationFraction, batch_format="pyarrow",
        concurrency=concurrency, fn_constructor_args=(ref,),
        fn_constructor_kwargs={"n": n, "text_col": text_col,
                               "id_col": id_col})
