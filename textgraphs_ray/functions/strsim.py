"""Batched string-similarity kernels for pairwise candidate scoring.

The reference scores alias matches with ``difflib.SequenceMatcher``
per pair (``/root/reference/textgraphs/kg.py:501-550``); the north rule
replaces this with batched Jaro-Winkler + Levenshtein.  Levenshtein is
fully numpy-vectorized across the pair batch (DP row sweep with a
min-scan resolving the insertion dependency), so a 64k-pair batch costs
~``max_len`` vector ops instead of 64k Python DP tables.  Jaro-Winkler
runs per distinct pair (short strings; distinct-pair pre-resolution in
the scoring stage keeps the Python loop off the hot path).
"""

from __future__ import annotations

import numpy as np


def _encode(strings: list[str], max_len: int) -> tuple[np.ndarray, np.ndarray]:
    """Pad/truncate to (N, max_len) int32 codepoint matrix + lengths."""
    n = len(strings)
    mat = np.zeros((n, max_len), dtype=np.int32)
    lens = np.empty(n, dtype=np.int32)
    for i, s in enumerate(strings):
        s = s[:max_len]
        lens[i] = len(s)
        if s:
            mat[i, : len(s)] = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int32)
    return mat, lens


def levenshtein_batch(a: list[str], b: list[str], *, max_len: int = 48) -> np.ndarray:
    """Vectorized edit distance for aligned pair lists.

    DP sweeps rows of ``a``; the intra-row insertion dependency
    ``cur[j] = min(..., cur[j-1]+1)`` is resolved with the classic
    min-scan ``minimum.accumulate(tmp - j) + j``.
    """
    assert len(a) == len(b)
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=np.int32)
    amat, alen = _encode(list(a), max_len)
    bmat, blen = _encode(list(b), max_len)
    lb = int(blen.max()) if n else 0
    la = int(alen.max()) if n else 0
    j_idx = np.arange(lb + 1, dtype=np.int32)

    prev = np.broadcast_to(j_idx, (n, lb + 1)).copy()
    result = prev[np.arange(n), blen].astype(np.int32)  # rows with len(a)==0
    for i in range(la):
        active = alen > i
        cost = (amat[:, i: i + 1] != bmat[:, :lb]).astype(np.int32)
        # substitution/deletion candidates (no insertion yet)
        tmp = np.empty_like(prev)
        tmp[:, 0] = i + 1
        tmp[:, 1:] = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost)
        # insertion via min-scan along j
        cur = np.minimum.accumulate(tmp - j_idx, axis=1) + j_idx
        prev = np.where(active[:, None], cur, prev)
        done = alen == i + 1
        if done.any():
            result[done] = prev[done, blen[done]]
    return result


def levenshtein_sim_batch(a: list[str], b: list[str]) -> np.ndarray:
    """Normalized Levenshtein similarity in [0,1]."""
    d = levenshtein_batch(a, b).astype(np.float64)
    ml = np.maximum(
        np.array([len(x) for x in a], dtype=np.float64),
        np.array([len(x) for x in b], dtype=np.float64),
    )
    ml[ml == 0] = 1.0
    return 1.0 - d / ml


def jaro(s1: str, s2: str) -> float:
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 1.0 if l1 == l2 else 0.0
    window = max(l1, l2) // 2 - 1
    if window < 0:
        window = 0
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - window)
        hi = min(l2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = True
                m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / l1 + matches / l2 + (matches - t) / matches) / 3.0


def jaro_winkler(s1: str, s2: str, *, prefix_weight: float = 0.1,
                 boost_threshold: float = 0.0) -> float:
    """``boost_threshold=0.0`` (the engine's ER-scoring default)
    applies the Winkler prefix boost unconditionally;
    ``boost_threshold=0.7`` is Winkler's original rule — and what
    DuckDB's ``jaro_winkler_similarity`` implements — boosting only
    when the Jaro core exceeds 0.7 (the two coincide whenever the
    result is ≥ 0.83; see ``stages/editjoin.jw_distinct_join``)."""
    j = jaro(s1, s2)
    if j <= boost_threshold:
        return j
    prefix = 0
    for c1, c2 in zip(s1[:4], s2[:4]):
        if c1 == c2:
            prefix += 1
        else:
            break
    return j + prefix * prefix_weight * (1.0 - j)


def jaro_winkler_batch(a: list[str], b: list[str], *,
                       boost_threshold: float = 0.0) -> np.ndarray:
    """JW over aligned pair lists with distinct-pair memoization."""
    cache: dict[tuple[str, str], float] = {}
    out = np.empty(len(a), dtype=np.float64)
    for i, (x, y) in enumerate(zip(a, b)):
        k = (x, y) if x <= y else (y, x)
        v = cache.get(k)
        if v is None:
            v = jaro_winkler(k[0], k[1],
                             boost_threshold=boost_threshold)
            cache[k] = v
        out[i] = v
    return out


def cosine_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise cosine similarity for (N,D) float arrays."""
    num = np.einsum("ij,ij->i", a, b)
    den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
    den[den == 0] = 1.0
    return num / den


def osa_within(a: str, b: str, k: int) -> bool:
    """True iff ``osa_distance(a, b) <= k`` — the thresholded check the
    scoring hot path needs.  ``abs(len(a)-len(b))`` is a LOWER bound on
    the distance (each length unit needs ≥1 indel), so a length gap
    > k decides without running the DP; otherwise fall through to the
    exact distance."""
    if abs(len(a) - len(b)) > k:
        return False
    if a == b:
        return True
    if k == 1:
        return _osa_within_one(a, b)
    return osa_distance(a, b) <= k


def _osa_within_one(a: str, b: str) -> bool:
    """True iff OSA distance ≤ 1, in O(n) without the DP table.

    Distance ≤ 1 means the strings are equal, differ by one
    substitution, one adjacent transposition, or one indel — each
    checkable directly from the first/last mismatch positions.  This
    replaces an O(n·m) Python DP on the scoring hot path (the alias
    rule calls it once per multi-token candidate pair)."""
    la, lb = len(a), len(b)
    if la == lb:
        # find first and last mismatch
        i = 0
        while i < la and a[i] == b[i]:
            i += 1
        if i == la:
            return True
        j = la - 1
        while j > i and a[j] == b[j]:
            j -= 1
        if i == j:
            return True  # single substitution
        return (j == i + 1 and a[i] == b[j] and a[j] == b[i])  # transposition
    if lb < la:
        a, b, la, lb = b, a, lb, la
    # lb == la + 1: one insertion into a
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def osa_distance(a: str, b: str) -> int:
    """Optimal-string-alignment distance: Levenshtein + adjacent
    transposition counted as ONE edit.  Exact for all inputs.  Scalar
    (used inside the name-compat rule on candidate pairs only, never
    over the full stream); for a ≤k check use :func:`osa_within`,
    which prunes on the length-difference lower bound first."""
    la, lb = len(a), len(b)
    d = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(la + 1):
        d[i][0] = i
    for j in range(lb + 1):
        d[0][j] = j
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1,
                          d[i - 1][j - 1] + cost)
            if (i > 1 and j > 1 and a[i - 1] == b[j - 2]
                    and a[i - 2] == b[j - 1]):
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + 1)
    return d[la][lb]


# --------------------------------------------------------------------
# phonetic blocking


import re as _re

_SOUNDEX_FROM = "AEIOUYHWBFPVCGJKQSXZDTLMNR"
_SOUNDEX_TO = "00000099111122222222334556"
_SOUNDEX_MAP = str.maketrans(_SOUNDEX_FROM, _SOUNDEX_TO)
_RUN_RES = [_re.compile(d + "+") for d in "0123456"]


def soundex(word: str) -> str:
    """American Soundex code (e.g. Robert → R163) — the classic
    phonetic blocking key for record linkage: names that sound alike
    land in the same block regardless of spelling variants.

    Implemented as the exact string-rewrite chain the SQL oracle
    replays step for step (RE2 has no backreferences, so run-collapse
    is one replace per digit): translate letters to codes (vowels→0,
    H/W→9), delete 9s (H/W are TRANSPARENT for adjacency — ASHCRAFT →
    A261), collapse each digit's runs, drop the first letter's own
    code group, delete the vowel separators, pad to 3 digits.
    Returns '' for words with no ASCII letters.
    """
    u = "".join(c for c in word.upper() if "A" <= c <= "Z")
    if not u:
        return ""
    t = u.translate(_SOUNDEX_MAP).replace("9", "")
    for rx in _RUN_RES:
        t = rx.sub(rx.pattern[0], t)
    t = t[1:].replace("0", "")
    return u[0] + (t + "000")[:3]
