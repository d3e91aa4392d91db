"""MinHash/LSH blocking with explicit skew handling (SURVEY.md A16/H2).

The reference has no blocking stage — node identity is exact lemma-key
equality (``/root/reference/textgraphs/graph.py:134-157``) and candidate
pairs are doc-local (``pipe.py:379-431``).  At 10^12 documents,
candidate generation must be sub-quadratic: MinHash signatures over
normalized surface shingles → LSH band keys → one groupby shuffle on
``(band_id, band_hash)`` → within-block pair generation.

Skew handling (north_rule requirement): a block larger than
``block_cap`` does NOT emit all C(g,2) pairs.  Members are sorted by
normalized text and each pairs with its next ``window`` neighbors —
pair count g·w instead of g², while the chain keeps the block connected
so transitive closure still merges it.  The truncation is explicit and
deterministic; recall accounting belongs to the metrics sink.

Input mentions must already be distinct per key (the node-upsert
groupby provides that), which is itself the biggest skew guard: a hot
surface form occurring in 5% of all docs is ONE row here, not 5% of the
corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.sketch import band_keys, minhash_batch

NUM_PERM = 64
# r=4 rows/band: catches typo-level similarity (J≳0.55) with high
# probability; lower-J same-entity pairs (initials) are covered by the
# exact last-token blocking pass, so r=2's junk-candidate volume is
# unnecessary
NUM_BANDS = 16
BLOCK_CAP = 32       # full pairing below this size
NEIGHBOR_WINDOW = 5  # sorted-neighborhood width above the cap


def normalize_surface(text: str) -> str:
    return " ".join(text.lower().replace(".", "").split())


class BandEmitter:
    """mentions(key, text) → (band_id, band_hash, key, norm_text) rows.

    One row per (mention, band): N×bands rows feed the blocking
    shuffle.  Signature computation is one vectorized pass per batch.
    """

    def __init__(self, *, num_perm: int = NUM_PERM, bands: int = NUM_BANDS) -> None:
        self.num_perm = num_perm
        self.bands = bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.sketch import hash64

        all_keys = batch.column("key").to_pylist()
        all_texts = [normalize_surface(t or "")
                     for t in batch.column("text").to_pylist()]
        # empty-text mentions (e.g. undecoded media) cannot match
        # textually — identical keys already share a node upstream
        keep = [i for i, t in enumerate(all_texts) if t]
        keys = [all_keys[i] for i in keep]
        texts = [all_texts[i] for i in keep]
        n = len(keys)
        sigs = minhash_batch(texts, num_perm=self.num_perm)
        bh = band_keys(sigs, bands=self.bands)  # (N, bands)
        band_id = np.tile(np.arange(self.bands, dtype=np.int32), n)

        # Extra blocking passes (standard multi-pass blocking):
        #  band -1: exact last token — catches initials + first-token
        #           typos that shingle MinHash misses;
        #  band -2: exact first token — catches last-token typos whose
        #           shingle Jaccard falls below the LSH bands'
        #           sensitivity (variants sort adjacently inside the
        #           block, so the sorted-neighbor window pairs them
        #           even in a hot first-name block).
        last_tok = [t.rsplit(" ", 1)[-1] for t in texts]
        first_tok = [t.split(" ", 1)[0] for t in texts]
        lt_hash = hash64(last_tok)
        ft_hash = hash64(first_tok)

        #  band -3: deletion neighborhood of the last token (SymSpell
        #  blocking): two strings within one edit (deletion, insertion,
        #  substitution, adjacent transposition) always share a
        #  delete-one variant, so every single-typo surface collides
        #  with its canonical form in at least one of these buckets —
        #  the MinHash bands' known blind spot.  Keyed with the first
        #  token's initial so buckets stay entity-local.
        dn_strings: list[str] = []
        dn_idx: list[int] = []
        for i, (ft, lt) in enumerate(zip(first_tok, last_tok)):
            init = ft[:1]
            dn_strings.append(init + "\x1f" + lt)  # zero-deletion form
            dn_idx.append(i)
            for p in range(len(lt)):
                dn_strings.append(init + "\x1f" + lt[:p] + lt[p + 1:])
                dn_idx.append(i)
        dn_hash = hash64(dn_strings)
        dn_idx_arr = np.asarray(dn_idx, dtype=np.int64)
        keys_arr = np.asarray(keys, dtype=object)
        texts_arr = np.asarray(texts, dtype=object)

        #  band -4: Soundex of the last token, keyed by the first
        #  token's initial (classic record-linkage surname blocking,
        #  functions/strsim.py soundex): sound-alike spelling variants
        #  beyond one edit ("smyth"/"smith", "kathryn"/"catherine")
        #  collide here when both MinHash shingles and the deletion
        #  neighborhood miss them.  One bucket per (initial, code) —
        #  same cap/window skew bound as every other pass.
        from ..functions.strsim import soundex
        ph_hash = hash64([ft[:1] + "\x1f" + soundex(lt)
                          for ft, lt in zip(first_tok, last_tok)])

        return pa.table({
            "band_id": pa.array(
                np.concatenate([band_id,
                                np.full(n, -1, dtype=np.int32),
                                np.full(n, -2, dtype=np.int32),
                                np.full(len(dn_idx), -3, dtype=np.int32),
                                np.full(n, -4, dtype=np.int32)])),
            "band_hash": pa.array(
                np.concatenate([bh.ravel(), lt_hash, ft_hash, dn_hash,
                                ph_hash]),
                pa.uint64()),
            "key": pa.array(
                list(np.repeat(keys_arr, self.bands))
                + keys + keys + list(keys_arr[dn_idx_arr]) + keys,
                pa.string()),
            "norm_text": pa.array(
                list(np.repeat(texts_arr, self.bands))
                + texts + texts + list(texts_arr[dn_idx_arr]) + texts,
                pa.string()),
        })


# Coarse shuffle key for pair generation: enough groups that the
# widest shard fits one task's heap, few enough that group scheduling
# doesn't dominate on small inputs.  Partitioning only affects WHERE a
# bucket's pairs are computed, never which pairs exist, so this can be
# raised for bigger clusters without changing results.
PAIR_PARTITIONS = 64


def segmented_pair_indices(sizes: np.ndarray, *, cap: int = BLOCK_CAP,
                           window: int = NEIGHBOR_WINDOW
                           ) -> tuple[np.ndarray, np.ndarray]:
    """Global (i, j) index pairs for contiguous groups of the given
    sizes: full C(g,2) pairing for groups ≤ cap, sorted-neighbor
    window pairing above (the salting/skew cap, SURVEY H2)."""
    iu_parts: list[np.ndarray] = []
    ju_parts: list[np.ndarray] = []
    start = 0
    for g in sizes:
        g = int(g)
        if g >= 2:
            if g <= cap:
                iu, ju = np.triu_indices(g, k=1)
            else:
                offs = np.arange(1, window + 1)
                iu = np.repeat(np.arange(g), window)
                ju = iu + np.tile(offs, g)
                mask = ju < g
                iu, ju = iu[mask], ju[mask]
            iu_parts.append(iu + start)
            ju_parts.append(ju + start)
        start += g
    if not iu_parts:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    return np.concatenate(iu_parts), np.concatenate(ju_parts)


def _pairs_for_partition(g: pd.DataFrame) -> pa.Table:
    """One coarse partition (many LSH buckets): vectorized pair
    generation across every bucket in a single call.

    Ray-level groups are the 256 coarse partitions, not the millions of
    individual buckets — per-group scheduling overhead disappears while
    the within-bucket semantics (dedup by key, sort by text, cap +
    window) are unchanged.  Emits ARROW so the pair stream rides Arrow
    blocks into any downstream shuffle (Ray aggregates on pandas
    blocks measured ~20× slower at 10^6 rows).
    """
    g = (g.drop_duplicates(["band_id", "band_hash", "key"])
         .sort_values(["band_id", "band_hash", "norm_text"], kind="stable"))
    sizes = g.groupby(["band_id", "band_hash"], sort=False).size().to_numpy()
    keys = g["key"].to_numpy()
    texts = g["norm_text"].to_numpy()
    iu, ju = segmented_pair_indices(sizes)
    ka, kb = keys[iu], keys[ju]
    ta, tb = texts[iu], texts[ju]
    swap = ka > kb
    ka2 = np.where(swap, kb, ka)
    kb2 = np.where(swap, ka, kb)
    ta2 = np.where(swap, tb, ta)
    tb2 = np.where(swap, ta, tb)
    keep = ka2 != kb2
    return pa.table({"key_a": pa.array(ka2[keep], pa.string()),
                     "key_b": pa.array(kb2[keep], pa.string()),
                     "text_a": pa.array(ta2[keep], pa.string()),
                     "text_b": pa.array(tb2[keep], pa.string())})


def candidate_pairs(mentions_ds: "ray.data.Dataset", *,
                    concurrency: int | None = None,
                    dedup: bool = False) -> "ray.data.Dataset":
    """mentions(key, text) → candidate pairs
    (key_a, key_b, text_a, text_b).

    One blocking shuffle on (band_id, band_hash).  A pair colliding in
    several bands is emitted once per band; with ``dedup=False``
    (default) the duplicates flow through — the scorer is vectorized
    and the closure stage is duplicate-insensitive, so re-scoring a few
    percent of pairs is cheaper than an extra all-to-all shuffle over
    the full pair stream.  ``dedup=True`` adds the groupby-aggregate
    dedup for callers that need distinct pairs (e.g. pair accounting).
    """
    # stateless signature computation → task-based map
    del concurrency
    banded = mentions_ds.map_batches(BandEmitter(), batch_format="pyarrow")

    def add_part(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        part = pc.cast(
            pc.bit_wise_and(t.column("band_hash"),
                            pa.scalar(PAIR_PARTITIONS - 1, pa.uint64())),
            pa.int32())
        return t.append_column("part", part)

    pairs = (banded.map_batches(add_part, batch_format="pyarrow")
             .groupby("part")
             .map_groups(_pairs_for_partition, batch_format="pandas"))
    if not dedup:
        return pairs

    from ray.data.aggregate import Min

    def add_pair_key(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        pk = pc.binary_join_element_wise(
            batch.column("key_a"), batch.column("key_b"), "\x1f")
        return batch.append_column("pair_key", pk)

    deduped = (pairs.map_batches(add_pair_key, batch_format="pyarrow")
               .groupby("pair_key")
               .aggregate(Min("key_a", alias_name="key_a"),
                          Min("key_b", alias_name="key_b"),
                          Min("text_a", alias_name="text_a"),
                          Min("text_b", alias_name="text_b")))
    return deduped.drop_columns(["pair_key"])


def sorted_neighborhood_pairs(ds: "ray.data.Dataset", *, key_col: str,
                              id_col: str, window: int,
                              bucket_width: int | None = None,
                              max_distinct: int = 1_000_000
                              ) -> "ray.data.Dataset":
    """Sorted-neighborhood blocking (Hernández–Stolfo): rows sort by
    ``key_col`` and every row pairs with its ``window`` successors —
    the classic alternative to hash blocking when near-duplicates
    sort adjacently (names, addresses, normalized titles).

    Distributed WITHOUT a global sort materialization: global ranks
    come from the broadcast distinct-key prefix table (the
    ``stats.ntile`` machinery — ties broken by ``id_col`` inside a
    bounded per-key groupby), then each ranked row lands in rank
    bucket ``r // bucket_width`` AND replicates to the previous
    bucket, so every (r, r+δ≤window) pair co-locates in exactly the
    bucket owning the smaller rank — emitted once, no dedup shuffle.
    ``bucket_width`` defaults to ``max(window + 1, 4096)`` (must be
    > ``window`` for single-bucket-overlap correctness).

    → (id_a, id_b, key_a, key_b, dist) with 1 ≤ dist ≤ window.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    W = bucket_width or max(window + 1, 4096)
    if W <= window:
        raise ValueError("bucket_width must exceed window")
    from ray.data.aggregate import Sum as _Sum

    def kpartial(t: pa.Table) -> pa.Table:
        import numpy as _np
        v, c = _np.unique(
            t.column(key_col).to_numpy(zero_copy_only=False),
            return_counts=True)
        return pa.table({key_col: pa.array(v),
                         "c": pa.array(c.astype(np.int64))})

    dist = (ds.map_batches(kpartial, batch_format="pyarrow")
            .groupby(key_col).aggregate(_Sum("c", alias_name="c"))
            .take_all())
    if len(dist) > max_distinct:
        raise ValueError(f"{len(dist)} distinct keys exceed "
                         f"max_distinct={max_distinct}")
    dist.sort(key=lambda r: r[key_col])
    start = {}
    before = 0
    for r in dist:
        start[r[key_col]] = before
        before += r["c"]
    ref = ray.put(start)

    def ranked(g: pd.DataFrame) -> pd.DataFrame:
        st = ray.get(ref)
        g = g.sort_values(id_col, kind="stable")
        r = st[g[key_col].iloc[0]] + np.arange(len(g), dtype=np.int64)
        prim = r // W
        out = pd.DataFrame({
            "r": np.concatenate([r, r]),
            "bucket": np.concatenate([prim, prim - 1]),
            "primary": np.concatenate([np.ones(len(g), bool),
                                       np.zeros(len(g), bool)]),
            id_col: np.concatenate([g[id_col].to_numpy()] * 2),
            key_col: np.concatenate([g[key_col].to_numpy()] * 2)})
        return out[out["bucket"] >= 0]

    rows = ds.groupby(key_col).map_groups(ranked,
                                          batch_format="pandas")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("r", kind="stable")
        r = g["r"].to_numpy()
        ids = g[id_col].to_numpy()
        keys = g[key_col].to_numpy()
        prim = g["primary"].to_numpy()
        ia, ib = [], []
        n = len(g)
        for i in range(n):
            if not prim[i]:
                continue
            j = i + 1
            while j < n and r[j] - r[i] <= window:
                ia.append(i)
                ib.append(j)
                j += 1
        ia = np.array(ia, np.int64)
        ib = np.array(ib, np.int64)
        if not len(ia):
            return pd.DataFrame({
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
                "key_a": pd.Series([], dtype=object),
                "key_b": pd.Series([], dtype=object),
                "dist": pd.Series([], dtype="int64")})
        return pd.DataFrame({
            "id_a": ids[ia], "id_b": ids[ib],
            "key_a": keys[ia], "key_b": keys[ib],
            "dist": r[ib] - r[ia]})

    return (rows.groupby("bucket")
            .map_groups(bucket_pairs, batch_format="pandas"))


def canopy_assign(ds: "ray.data.Dataset", *, key_col: str,
                  text_col: str, t_loose: float = 0.3,
                  t_tight: float = 0.7,
                  max_centers: int = 100_000) -> "ray.data.Dataset":
    """Canopy clustering (McCallum–Nigam–Ungar 2000): overlapping
    coarse clusters from a CHEAP similarity (token-set Jaccard) so an
    expensive scorer only runs within canopies — the data-adaptive
    complement to LSH banding when block keys are hard to hash
    (free-text mentions, addresses).

    Distributed two-level construction mirroring the local-skyline
    pattern: each block greedily picks LOCAL centers in sorted-key
    order (a point within ``t_tight`` of an existing center never
    becomes one), the small center union is greedily deduped once
    driver-side under the same rule (``max_centers`` guard), and the
    final center list broadcasts into one stateless assignment scan —
    every row joins ALL canopies whose center is ≥ ``t_loose``
    similar, plus its nearest center as a fallback so no row is
    orphaned.  Deterministic for any block layout at fixed center
    set; the two-level greedy itself is layout-stable because center
    candidacy only shrinks under merging (pytest pins the planted
    recall property, not center identity).

    → (key, canopy_id) rows, one per (row, canopy) membership.
    """
    if not 0.0 <= t_loose <= t_tight <= 1.0:
        raise ValueError("need 0 <= t_loose <= t_tight <= 1")
    # consumed twice (center scan + assignment scan) — pin once so a
    # lazy upstream never re-executes (the consume-once invariant);
    # mention tables are distinct-key-bounded, so the pin is cheap
    ds = ds.materialize()

    def toks(s: str) -> frozenset:
        return frozenset((s or "").lower().split())

    def jac(a: frozenset, b: frozenset) -> float:
        if not a or not b:
            return 0.0
        i = len(a & b)
        return i / (len(a) + len(b) - i)

    def greedy_centers(items):
        centers: list[tuple] = []
        for k, ts in items:
            if all(jac(ts, cts) < t_tight for _, cts in centers):
                centers.append((k, ts))
        return centers

    def local_centers(t: pa.Table) -> pd.DataFrame:
        items = sorted(
            (k, toks(x)) for k, x in
            zip(t.column(key_col).to_pylist(),
                t.column(text_col).to_pylist()))
        cs = greedy_centers(items)
        return pd.DataFrame({
            "ckey": [c[0] for c in cs],
            "ctext": [" ".join(sorted(c[1])) for c in cs]})

    cand = (ds.map_batches(local_centers, batch_format="pyarrow")
            .take_all())
    if len(cand) > max_centers:
        raise ValueError(f"{len(cand)} canopy centers exceed "
                         f"max_centers={max_centers}; raise t_tight")
    merged = greedy_centers(sorted(
        (r["ckey"], toks(r["ctext"])) for r in cand))
    centers = [(i, k, ts) for i, (k, ts) in enumerate(merged)]
    ref = ray.put(centers)

    def assign(t: pa.Table) -> pd.DataFrame:
        cs = ray.get(ref)
        keys_out, canopies = [], []
        for k, x in zip(t.column(key_col).to_pylist(),
                        t.column(text_col).to_pylist()):
            ts = toks(x)
            sims = [(jac(ts, cts), cid) for cid, _, cts in cs]
            hits = [cid for s, cid in sims if s >= t_loose]
            if not hits:
                hits = [max(sims)[1]]   # nearest-center fallback
            keys_out.extend([k] * len(hits))
            canopies.extend(hits)
        return pd.DataFrame({
            key_col: keys_out,
            "canopy_id": np.array(canopies, np.int64)})

    return ds.map_batches(assign, batch_format="pyarrow")
