"""Text-analysis operators for large-scale training-data pipelines:
language ID, quality scoring, token counting, fingerprinting.

All are single-pass ``map_batches`` stages (no shuffle).  Regexes and
language profiles are compiled once per actor (``__init__``), batches
are processed with vectorized pandas/pyarrow string kernels where the
kernel exists, Python loops only inside per-string scoring that has no
columnar equivalent.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

# Small closed-class profiles per language (public stopword knowledge).
_LANG_PROFILES: dict[str, set[str]] = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "was", "for", "with",
           "that", "on", "as", "are", "at", "this", "from", "by", "it"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "los", "las",
           "por", "con", "para", "es", "del", "se", "no", "su"},
    "fr": {"le", "la", "les", "de", "des", "et", "en", "un", "une", "du",
           "que", "qui", "dans", "pour", "est", "sur", "au", "pas"},
    "de": {"der", "die", "das", "und", "in", "von", "zu", "den", "mit",
           "ist", "des", "im", "ein", "eine", "auf", "als", "auch"},
}

_STOP_EN = _LANG_PROFILES["en"]


class TokenCounter:
    """Add ``n_tokens``: whitespace tokens + a BPE-ish sub-token count
    (word-piece estimate: alpha runs split every 4 chars + digits +
    punctuation marks)."""

    def __init__(self, *, text_col: str = "text") -> None:
        self.text_col = text_col
        self.ws = re.compile(r"\s+")
        self.piece = re.compile(r"[A-Za-z]{1,4}|[0-9]|[^\sA-Za-z0-9]")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        # semantics match the SQL oracle: split the trimmed text on \s+
        # (empty string → one empty token, as regexp_split_to_array does)
        n_tok = np.fromiter(
            (len(self.ws.split(t.strip())) if t is not None else 0
             for t in texts), dtype=np.int64, count=len(texts))
        n_bpe = np.fromiter(
            (len(self.piece.findall(t)) if t else 0 for t in texts),
            dtype=np.int64, count=len(texts))
        return (batch.append_column("n_tokens", pa.array(n_tok))
                .append_column("n_bpe_tokens", pa.array(n_bpe)))


class QualityScorer:
    """Add quality signals: punctuation ratio, uppercase ratio, mean
    word length, stopword ratio, and a [0,1] composite score.

    Mirrors standard pretraining-corpus filters (C4/Gopher-style
    length/punct/stopword heuristics), expressed as one vectorized
    batch pass.
    """

    def __init__(self, *, text_col: str = "text") -> None:
        self.text_col = text_col
        self.word = re.compile(r"[A-Za-z']+")
        self.punct = re.compile(r"[.!?,;:]")
        self._punct_cps = np.array([ord(c) for c in ".!?,;:"], np.uint32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        n = len(texts)
        # char-class counts (punct, uppercase) in ONE numpy pass over the
        # batch's concatenated codepoints + segment-sum per row — exact
        # str.isupper() semantics (non-ascii codepoints checked once each)
        lens = np.fromiter((len(t) if t else 0 for t in texts),
                           np.int64, count=n)
        joined = "".join(t for t in texts if t)
        cps = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        is_up = (cps >= 65) & (cps <= 90)
        hi = cps >= 128
        if hi.any():
            uniq = np.unique(cps[hi])
            up_mask = np.fromiter((chr(int(u)).isupper() for u in uniq),
                                  bool, count=len(uniq))
            if up_mask.any():
                is_up |= np.isin(cps, uniq[up_mask])
        is_punct = np.isin(cps, self._punct_cps)
        ends = np.cumsum(lens)
        starts = ends - lens
        cum_up = np.concatenate(([0], np.cumsum(is_up)))
        cum_punct = np.concatenate(([0], np.cumsum(is_punct)))
        nz = lens > 0
        punct_ratio = np.zeros(n)
        upper_ratio = np.zeros(n)
        punct_ratio[nz] = ((cum_punct[ends] - cum_punct[starts])[nz]
                           / lens[nz])
        upper_ratio[nz] = (cum_up[ends] - cum_up[starts])[nz] / lens[nz]
        # word stats: stopword membership needs tokenization (no Arrow
        # kernel); the regex + set lookups are the only per-row Python left
        mean_wlen = np.zeros(n)
        stop_ratio = np.zeros(n)
        for i, t in enumerate(texts):
            if not t:
                continue
            words = self.word.findall(t.lower())
            if words:
                mean_wlen[i] = sum(map(len, words)) / len(words)
                stop_ratio[i] = sum(w in _STOP_EN for w in words) / len(words)
        score = np.clip(
            0.25 * (punct_ratio > 0.001)
            + 0.25 * np.clip(stop_ratio / 0.1, 0, 1)
            + 0.25 * np.clip(mean_wlen / 4.0, 0, 1) * (mean_wlen < 12)
            + 0.25 * (upper_ratio < 0.3),
            0, 1)
        return (batch.append_column("punct_ratio", pa.array(punct_ratio))
                .append_column("upper_ratio", pa.array(upper_ratio))
                .append_column("mean_word_len", pa.array(mean_wlen))
                .append_column("stopword_ratio", pa.array(stop_ratio))
                .append_column("quality_score", pa.array(score)))


class LangId:
    """Add ``lang_pred``: argmax stopword-profile overlap (n-gram/word
    heuristic langid); "und" when no profile scores."""

    def __init__(self, *, text_col: str = "text") -> None:
        self.text_col = text_col
        # ascii letter runs: profiles are ascii stopwords, so non-ascii
        # codepoints act as separators (keeps the op SQL-checkable —
        # identical to regexp_split_to_array(lower(text), '[^a-z]+'))
        self.word = re.compile(r"[a-z]+")
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        out = []
        for t in texts:
            words = self.word.findall((t or "").lower())
            # CJK heuristic: any han codepoint dominates
            if t and any("一" <= c <= "鿿" for c in t[:200]):
                out.append("zh")
                continue
            best, best_n = "und", 0
            for lang, prof in self.profiles.items():
                k = sum(w in prof for w in words)
                if k > best_n:
                    best, best_n = lang, k
            out.append(best)
        return batch.append_column("lang_pred", pa.array(out, pa.string()))


class Fingerprinter:
    """Add ``fp_md5`` (exact content fingerprint) and ``fp_rolling``
    (64-bit rolling/Karp-Rabin hash over normalized words — robust to
    whitespace differences)."""

    def __init__(self, *, text_col: str = "text") -> None:
        self.text_col = text_col
        self.ws = re.compile(r"\s+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.sketch import hash64

        texts = batch.column(self.text_col).to_pylist()
        md5s = [hashlib.md5((t or "").encode("utf-8")).hexdigest()
                for t in texts]
        # rolling hash h = Σ wh_i · B^(n-1-i) (mod 2^64) — identical to
        # the sequential h = h·B + wh recurrence, but computed for the
        # WHOLE batch with one vectorized word-hash call + one
        # power-weighted segment sum (reduceat), no per-word Python
        words_per_doc: list[list[str]] = [
            self.ws.split((t or "").strip()) for t in texts]
        lens = np.fromiter((len(w) for w in words_per_doc), np.int64,
                           count=len(texts))
        flat_words = [w for ws in words_per_doc for w in ws]
        wh = hash64(flat_words)
        B = np.uint64(1000003)
        max_len = int(lens.max()) if len(lens) else 1
        pows = np.empty(max_len, dtype=np.uint64)
        with np.errstate(over="ignore"):
            pows[0] = np.uint64(1)
            for p in range(1, max_len):
                pows[p] = pows[p - 1] * B
            # exponent for word i in a doc of n words: n-1-i
            exps = np.concatenate(
                [np.arange(n - 1, -1, -1, dtype=np.int64) for n in lens]
            ) if len(lens) else np.zeros(0, np.int64)
            weighted = wh * pows[exps]
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            roll = np.add.reduceat(weighted, starts) if len(flat_words) \
                else np.zeros(0, np.uint64)
        return (batch.append_column("fp_md5", pa.array(md5s, pa.string()))
                .append_column("fp_rolling",
                               pa.array(roll.astype(np.uint64),
                                        pa.uint64())))


class RepetitionScorer:
    """Add Gopher-style repetition signals: ``line_dup_ratio`` (1 −
    distinct/total non-empty lines) and ``word_dup_ratio`` (1 −
    distinct/total whitespace words).  High values mark boilerplate /
    template spam — standard pretraining-corpus filters alongside
    :class:`QualityScorer`'s length/punct/stopword heuristics."""

    def __init__(self, *, text_col: str = "text") -> None:
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        n = len(texts)
        line_dup = np.zeros(n)
        word_dup = np.zeros(n)
        for i, t in enumerate(texts):
            if not t:
                continue
            lines = [l for l in t.split("\n") if l.strip()]
            if lines:
                line_dup[i] = 1.0 - len(set(lines)) / len(lines)
            words = t.split()
            if words:
                word_dup[i] = 1.0 - len(set(words)) / len(words)
        return (batch.append_column("line_dup_ratio", pa.array(line_dup))
                .append_column("word_dup_ratio", pa.array(word_dup)))


class GopherGate:
    """Composite Gopher-style quality gate (Rae et al. 2021 §A1.1,
    public): ONE stateless pass emits every rule input AND the
    verdict, so downstream keeps the verdict column while audits keep
    the signals.  Rules (each individually SQL-replayable, so the
    whole gate value-hash oracles):

    - ``n_words`` in ``[min_words, max_words]``
    - ``mean_wl`` (mean word length, 6dp) in ``[min_wl, max_wl]``
    - ``stop_hits`` (DISTINCT stopwords present) ``>= min_stop_hits``
    - ``top_frac`` (most-frequent-word fraction, 6dp) ``<= max_top_frac``
      — the single-word repetition rule
    - ``passes`` = all of the above, emitted as int64 0/1

    Words are ``[a-z]+`` runs of the lowercased text (one compiled
    regex per actor, reused per batch).  The gate compares the ROUNDED
    float signals so parity with the SQL oracle is structural, not
    float-sum-order luck.  Zero-word documents emit zeros and fail.
    Thresholds are constructor args — the defaults are calibrated to
    discriminate on the synthetic corpus, not Gopher's web-scale
    values; pass Gopher's own (50/100k words, 3-10 chars, 2 stopword
    hits) for a real corpus."""

    def __init__(self, *, text_col: str = "text",
                 min_words: int = 20, max_words: int = 90,
                 min_wl: float = 3.5, max_wl: float = 6.0,
                 stopwords: tuple = ("a", "the", "of", "to", "and"),
                 min_stop_hits: int = 1,
                 max_top_frac: float = 0.2) -> None:
        self.text_col = text_col
        self.min_words, self.max_words = min_words, max_words
        self.min_wl, self.max_wl = min_wl, max_wl
        self.stopwords = frozenset(stopwords)
        self.min_stop_hits = min_stop_hits
        self.max_top_frac = max_top_frac
        self.word_re = re.compile(r"[a-z]+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        n = len(texts)
        n_words = np.zeros(n, np.int64)
        mean_wl = np.zeros(n, np.float64)
        stop_hits = np.zeros(n, np.int64)
        top_frac = np.zeros(n, np.float64)
        for i, t in enumerate(texts):
            words = self.word_re.findall((t or "").lower())
            if not words:
                continue
            arr = np.asarray(words, dtype=object)
            uniq, counts = np.unique(arr, return_counts=True)
            total = len(words)
            n_words[i] = total
            mean_wl[i] = round(
                sum(len(w) for w in words) / float(total), 6)
            stop_hits[i] = sum(1 for w in uniq if w in self.stopwords)
            top_frac[i] = round(int(counts.max()) / float(total), 6)
        passes = ((n_words >= self.min_words)
                  & (n_words <= self.max_words)
                  & (mean_wl >= self.min_wl) & (mean_wl <= self.max_wl)
                  & (stop_hits >= self.min_stop_hits)
                  & (top_frac <= self.max_top_frac)).astype(np.int64)
        return (batch.append_column("n_words", pa.array(n_words))
                .append_column("mean_wl", pa.array(mean_wl))
                .append_column("stop_hits", pa.array(stop_hits))
                .append_column("top_frac", pa.array(top_frac))
                .append_column("passes", pa.array(passes)))


class Scrubber:
    """C4-style cleaning: mask URLs and e-mail addresses (``<URL>`` /
    ``<EMAIL>``), collapse runs of whitespace.  Patterns are chosen to
    mean the same thing in Python ``re`` and RE2/DuckDB, so the
    transform is oracle-checkable verbatim."""

    def __init__(self, *, text_col: str = "text") -> None:
        self.text_col = text_col
        self.url = re.compile(r"https?://[^\s]+")
        self.email = re.compile(
            r"[A-Za-z0-9_.+-]+@[A-Za-z0-9-]+\.[A-Za-z0-9.-]+")
        self.ws = re.compile(r"[ \t]+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        out = []
        for t in texts:
            t = t or ""
            t = self.url.sub("<URL>", t)
            t = self.email.sub("<EMAIL>", t)
            t = self.ws.sub(" ", t)
            out.append(t)
        return batch.append_column("text_clean",
                                   pa.array(out, pa.string()))


class CompressionRatio:
    """Add ``compress_ratio``: len(zlib(text)) / len(utf-8 text) — the
    entropy-proxy quality filter (highly repetitive/templated documents
    compress far below natural text; random noise compresses above).
    Not SQL-expressible (no SQL zlib) — accuracy asserted in tests."""

    def __init__(self, *, text_col: str = "text", level: int = 6) -> None:
        self.text_col = text_col
        self.level = level

    def __call__(self, batch: pa.Table) -> pa.Table:
        import zlib

        texts = batch.column(self.text_col).to_pylist()
        ratios = np.zeros(len(texts))
        for i, t in enumerate(texts):
            raw = (t or "").encode("utf-8")
            if raw:
                ratios[i] = len(zlib.compress(raw, self.level)) / len(raw)
        return batch.append_column("compress_ratio", pa.array(ratios))


def chunk_windows(ds: "ray.data.Dataset", *, size: int = 500,
                  stride: int = 400, text_col: str = "text",
                  id_col: str = "doc_id",
                  keep_text: bool = True) -> "ray.data.Dataset":
    """Split every document into overlapping character windows — the
    retrieval / context-window prep step (RAG chunking, long-document
    truncation): chunk ``i`` covers ``[i*stride, i*stride + size)``,
    one output row per chunk (``doc_id, chunk_id, chunk_len[, chunk_text]``).
    Standard sliding-window count — ``max(1, ceil((len-size)/stride)+1)``
    chunks per non-empty doc — so a window whose content is fully
    inside the previous one (possible whenever ``size > stride``) is
    never emitted: redundant duplicate-content chunks would bloat a
    RAG index with exact dups.

    A row-expanding stateless ``map_batches`` (output rows ≠ input
    rows, no shuffle): the chunk count per document is computed
    vectorized, then one Arrow ``utf8_slice_codeunits`` per chunk
    POSITION (a handful of iterations — bounded by the longest doc in
    the batch, not the row count) slices every row at that position at
    once in C++ (a pandas ``str.slice`` here is an object-dtype Python
    loop).  Character (codepoint) semantics match SQL
    ``substr``/``len`` — verified: ``utf8_slice_codeunits`` /
    ``utf8_length`` count codepoints, not bytes — so the oracle
    replays chunk boundaries exactly via ``generate_series``.  Empty
    documents yield zero chunks.
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")

    def expand(t: pa.Table) -> pa.Table:
        ids = t.column(id_col)
        texts = pc.fill_null(pc.cast(t.column(text_col), pa.string()), "")
        lens = pc.utf8_length(texts).to_numpy(
            zero_copy_only=False).astype(np.int64)
        # sliding-window count: 1 chunk when len<=size, else
        # ceil((len-size)/stride)+1; 0 for empty docs
        n_chunks = np.where(
            lens == 0, 0,
            np.maximum(1, -(-(lens - size) // stride) + 1)).astype(np.int64)
        tables = []
        for j in range(int(n_chunks.max()) if len(n_chunks) else 0):
            mask = pa.array(n_chunks > j)
            piece = pc.utf8_slice_codeunits(
                texts.filter(mask), start=j * stride,
                stop=j * stride + size)
            cols = {
                id_col: ids.filter(mask),
                "chunk_id": pa.array(
                    np.full(len(piece), j, np.int64)),
                "chunk_len": pc.cast(pc.utf8_length(piece), pa.int64()),
            }
            if keep_text:
                cols["chunk_text"] = piece
            tables.append(pa.table(cols))
        if not tables:
            cols = {id_col: pa.array([], t.schema.field(id_col).type),
                    "chunk_id": pa.array([], pa.int64()),
                    "chunk_len": pa.array([], pa.int64())}
            if keep_text:
                cols["chunk_text"] = pa.array([], pa.string())
            return pa.table(cols)
        return pa.concat_tables(tables)

    return ds.map_batches(expand, batch_format="pyarrow")


def winnow_fingerprints(ds: "ray.data.Dataset", *, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 8,
                        w: int = 4) -> "ray.data.Dataset":
    """MOSS-style winnowing document fingerprints (Schleimer et al.,
    SIGMOD 2003): hash every ``k``-gram, slide a ``w``-hash window,
    keep each window's minimum — any shared substring of length
    ``k + w - 1`` between two documents is GUARANTEED to surface as a
    shared fingerprint, which is the plagiarism/near-copy detection
    property plain MinHash lacks.  → (doc_id, n_fp, min_fp): distinct
    selected-fingerprint count and the smallest fingerprint per doc.

    One stateless row-parallel ``map_batches`` — no shuffle, no state.
    The k-gram hash is ``md5(k-gram)[:16]`` so the SQL oracle replays
    selection EXACTLY (DuckDB ``md5``/``substr`` agree on codepoint
    semantics; the hex prefix compares identically as text in both
    engines).  Documents with fewer than ``w`` k-grams contribute one
    window over all their hashes; docs shorter than ``k`` emit no row.
    At 100 TB swap the md5 kernel for the Karp–Rabin rolling hash of
    ``substring_dedup`` (stages/dedup.py) — same selection plan, one
    multiply-add per position instead of a digest.
    """
    if k <= 0 or w <= 0:
        raise ValueError("k and w must be positive")

    def fps(t: pa.Table) -> pa.Table:
        ids, nfp, minfp = [], [], []
        for did, txt in zip(t.column(id_col).to_pylist(),
                            t.column(text_col).to_pylist()):
            s = txt or ""
            n = len(s) - k + 1
            if n < 1:
                continue
            hs = np.array(
                [int(hashlib.md5(s[i:i + k].encode()).hexdigest()[:16],
                     16) for i in range(n)], dtype=np.uint64)
            if n <= w:
                sel = hs.min(keepdims=True)
            else:
                sel = np.lib.stride_tricks.sliding_window_view(
                    hs, w).min(axis=1)
            uniq = np.unique(sel)
            ids.append(did)
            nfp.append(len(uniq))
            minfp.append(f"{uniq[0]:016x}")
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "n_fp": pa.array(nfp, pa.int64()),
                         "min_fp": pa.array(minfp, pa.string())})

    return ds.map_batches(fps, batch_format="pyarrow")


def ngram_diversity(ds: "ray.data.Dataset", *, text_col: str = "text",
                    group_col: str = "source",
                    n: int = 2) -> "ray.data.Dataset":
    """→ (group, n_ngrams, n_distinct, ratio): the distinct-n corpus
    diversity metric (Li et al. 2016 "distinct-2") per group — total
    within-document word n-grams, how many are distinct across the
    group, and their ratio (6dp).  Low ratios flag template/boiler-
    plate-heavy or degenerate sources before they skew a training
    mix.

    Tokenization is the repo's SQL-replayable lowercase [a-z]+ split.
    Plan: one stateless tokenize pass emits per-batch totals AND
    per-batch-DISTINCT (group, ngram) rows (the combiner: at most one
    row per distinct n-gram leaves any block), one groupby dedups
    n-grams globally, one count groupby per group, and the bounded
    per-group totals join on the driver.  The exchange carries
    distinct n-gram STRINGS (bounded length), never document text —
    hashing would be cheaper but could collide and break exact
    distinct counts."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    import re as _re

    from ray.data.aggregate import Count, Sum

    word_re = _re.compile(r"[^a-z]+")
    SEP = "\x1f"

    def emit(t: pa.Table) -> pa.Table:
        groups = t.column(group_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        tot: dict[str, int] = {}
        seen: set[tuple[str, str]] = set()
        for g, txt in zip(groups, texts):
            words = [w for w in word_re.split((txt or "").lower())
                     if w]
            m = len(words) - n + 1
            if m <= 0:
                tot.setdefault(g, 0)
                continue
            tot[g] = tot.get(g, 0) + m
            for i in range(m):
                seen.add((g, SEP.join(words[i:i + n])))
        gs = sorted(tot)
        t1 = pa.table({
            "g": pa.array([x[0] for x in seen], pa.string()),
            "ng": pa.array([x[1] for x in seen], pa.string()),
            "tot": pa.array(np.zeros(len(seen), np.int64))})
        t2 = pa.table({
            "g": pa.array(gs, pa.string()),
            "ng": pa.array([""] * len(gs), pa.string()),
            "tot": pa.array([tot[g] for g in gs], pa.int64())})
        # the "" n-gram rows carry totals; real n-grams are non-empty
        # (the tokenizer drops empty words) so the streams can share
        # one table without colliding
        return pa.concat_tables([t1, t2])

    # consumed twice (distinct branch + totals branch): pin once so
    # the tokenize/emit pass doesn't re-execute per consumer
    both = ds.map_batches(emit, batch_format="pyarrow").materialize()
    distinct = (both.filter(expr="ng != ''")
                .groupby(["g", "ng"]).aggregate(Count(alias_name="_c"))
                .groupby("g").aggregate(Count(alias_name="n_distinct")))
    totals = (both.filter(expr="ng == ''")
              .groupby("g").aggregate(Sum("tot", alias_name="n_ngrams")))
    # bounded group census: fold the two tiny tables on the driver
    d = {r["g"]: r["n_distinct"] for r in distinct.take_all()}
    tt = {r["g"]: r["n_ngrams"] for r in totals.take_all()}
    gs = sorted(tt)
    n_tot = np.array([tt[g] for g in gs], np.int64)
    n_dis = np.array([d.get(g, 0) for g in gs], np.int64)
    from ..functions.rounding import round_half_away

    ratio = np.where(n_tot > 0,
                     round_half_away(n_dis / np.maximum(n_tot, 1), 6),
                     0.0)
    return ray.data.from_arrow(pa.table({
        group_col: pa.array(gs, pa.string()),
        "n_ngrams": pa.array(n_tot), "n_distinct": pa.array(n_dis),
        "ratio": pa.array(ratio)}))
