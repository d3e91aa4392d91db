"""Sketching kernels: shingles, MinHash/LSH bands, SimHash, and the
shingle-hash embedding used by the encoder actor pool.

The reference blocks implicitly by exact lemma-key equality
(``/root/reference/textgraphs/graph.py:134-157``) and doc-local pairing
(``pipe.py:379-431``); MinHash/LSH blocking is the explicit sketch the
north rule adds for 10^12-row scale (SURVEY.md A16).  All kernels are
batch-vectorized: shingles for a whole batch are flattened once and
reduced with ``np.minimum.reduceat`` — no per-string Python DP.
"""

from __future__ import annotations

import numpy as np

_MERSENNE = np.uint64((1 << 61) - 1)
_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _perm_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    return a, b


def char_shingles(text: str, k: int = 3) -> list[str]:
    """Character k-shingles of a normalized string (lower, single-space)."""
    t = " ".join(text.lower().split())
    if len(t) < k:
        return [t] if t else []
    return [t[i: i + k] for i in range(len(t) - k + 1)]


def hash64(values: list[str]) -> np.ndarray:
    """Deterministic 64-bit string hashes → uint64 array.

    Fixed-key siphash via ``pandas.util.hash_array`` — one vectorized C
    call for the whole list (~8× the former per-character Python FNV
    loop, measured on the shingle stream), deterministic across
    processes, runs, and cluster layouts (the hash key is a pandas
    constant).  Every consumer uses these as either exact-equality
    bucket ids or MinHash inputs, so only determinism and uniformity
    matter — not the specific function."""
    import pandas as pd

    if not len(values):
        return np.zeros(0, dtype=np.uint64)
    return pd.util.hash_array(np.asarray(values, dtype=object))


def minhash_batch(texts: list[str], *, num_perm: int = 64, k: int = 3,
                  seed: int = 42) -> np.ndarray:
    """(N, num_perm) uint64 MinHash signatures for a batch of strings.

    Flattens every string's shingle hashes into one array, applies all
    permutations as one (P, total) broadcast, and reduces per string
    with ``minimum.reduceat`` — one vectorized pass per batch.
    """
    a, b = _perm_params(num_perm, seed)
    all_shingles: list[str] = []
    offsets = [0]
    for t in texts:
        sh = char_shingles(t, k)
        if not sh:
            sh = ["\x00"]
        all_shingles.extend(sh)
        offsets.append(offsets[-1] + len(sh))
    flat = hash64(all_shingles)  # ONE vectorized call per batch
    n = len(texts)
    if flat.size == 0:
        return np.zeros((n, num_perm), dtype=np.uint64)
    starts = np.array(offsets[:-1], dtype=np.int64)
    sig = np.empty((num_perm, n), dtype=np.uint64)
    with np.errstate(over="ignore"):
        # one permutation at a time: the 1-D temporary stays in cache,
        # ~20× faster than the (P, total) 2-D broadcast at equal output
        for p in range(num_perm):
            ph = a[p] * flat
            ph += b[p]
            ph %= _MERSENNE  # universal hash folded to 61-bit Mersenne field
            sig[p] = np.minimum.reduceat(ph, starts)
    return sig.T.copy()


def band_keys(signatures: np.ndarray, *, bands: int = 16) -> np.ndarray:
    """(N, bands) uint64 band hashes from (N, P) signatures (P % bands == 0).

    Equal band hash ⇔ equal signature slice ⇒ LSH candidate bucket.
    """
    n, p = signatures.shape
    r = p // bands
    sl = signatures[:, : bands * r].reshape(n, bands, r)
    with np.errstate(over="ignore"):
        h = np.full((n, bands), _FNV_OFFSET, dtype=np.uint64)
        for j in range(r):
            h = (h ^ sl[:, :, j]) * _FNV_PRIME
    return h


def simhash_batch(texts: list[str], *, k: int = 3) -> np.ndarray:
    """64-bit SimHash per string (bit-majority over shingle hashes)."""
    n = len(texts)
    bits = np.arange(64, dtype=np.uint64)
    # one flattened hash64 call + segmented bit-majority (reduceat),
    # mirroring minhash_batch — no per-text hashing overhead
    all_sh: list[str] = []
    counts = np.empty(n, dtype=np.int64)
    for i, t in enumerate(texts):
        sh = char_shingles(t, k)
        counts[i] = len(sh)
        all_sh.extend(sh)
    out = np.zeros(n, dtype=np.uint64)
    nonempty = counts > 0
    if not all_sh:
        return out
    h = hash64(all_sh)
    bitmat = ((h[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int32)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    # reduceat needs strictly valid segment starts: drop empty rows
    seg_sums = np.add.reduceat(bitmat, starts[nonempty], axis=0)
    maj = (seg_sums * 2 > counts[nonempty, None]).astype(np.uint64)
    out[nonempty] = np.bitwise_or.reduce(maj << bits[None, :], axis=1)
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Popcount of XOR for aligned uint64 arrays."""
    x = np.bitwise_xor(a, b)
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt


def jaccard_shingles(a: str, b: str, k: int = 3) -> float:
    sa, sb = set(char_shingles(a, k)), set(char_shingles(b, k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def shingle_embedding_batch(texts: list[str], *, dim: int = 64,
                            k: int = 3) -> np.ndarray:
    """(N, dim) float32 embeddings: signed feature hashing of character
    shingles, L2-normalized.  Similar surface forms share most shingles
    ⇒ high cosine — the deterministic stand-in for the reference's
    transformer encoders (``rel.py:121-142``), with identical Ray
    plumbing (actor pool, batched inference)."""
    n = len(texts)
    out = np.zeros((n, dim), dtype=np.float32)
    # flatten every text's shingles into ONE hash64 call (the pandas
    # siphash has ~0.5 ms fixed overhead per call — per-text calls were
    # the scorer's top cost), then scatter-add into a flat (n*dim) view
    all_sh: list[str] = []
    rows: list[int] = []
    for i, t in enumerate(texts):
        sh = char_shingles(t, k)
        all_sh.extend(sh)
        rows.extend([i] * len(sh))
    if all_sh:
        h = hash64(all_sh)
        idx = (h % np.uint64(dim)).astype(np.int64)
        sign = np.where((h >> np.uint64(32)) & np.uint64(1),
                        np.float32(1.0), np.float32(-1.0))
        flat = np.zeros(n * dim, dtype=np.float32)
        np.add.at(flat, np.asarray(rows, dtype=np.int64) * dim + idx, sign)
        out = flat.reshape(n, dim)
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return out / norms
