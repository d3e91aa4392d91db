"""Property-based invariants (hypothesis) for the core kernels.

These run entirely driver-side (no Ray round-trips per example) so the
example budget stays cheap: closure via the driver union-find fast
path, pair generation and sketches as pure numpy."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st


# --- transitive closure ≡ connected components --------------------------


def _brute_components(nodes: list[str], edges: list[tuple[str, str]]):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_closure_matches_brute_union_find(ray_session, data):
    import ray.data as rd

    from textgraphs_ray.stages.cluster import propagate_labels

    n = data.draw(st.integers(2, 12))
    nodes = [f"n{i:02d}" for i in range(n)]
    n_edges = data.draw(st.integers(0, 16))
    edges = [
        (nodes[data.draw(st.integers(0, n - 1))],
         nodes[data.draw(st.integers(0, n - 1))])
        for _ in range(n_edges)
    ]
    expected = _brute_components(nodes, edges)

    nds = rd.from_arrow(pa.table({"key": pa.array(nodes)}))
    eds = rd.from_arrow(pa.table({
        "key_a": pa.array([a for a, _ in edges], pa.string()),
        "key_b": pa.array([b for _, b in edges], pa.string()),
    }))
    got = propagate_labels(nds, eds, num_partitions=2).to_pandas()
    assert dict(zip(got["key"], got["cluster_id"])) == expected


# --- pair generation ----------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(0, 12), min_size=1, max_size=8),
       st.integers(2, 6), st.integers(1, 4))
def test_segmented_pairs_stay_within_groups(sizes, cap, window):
    from textgraphs_ray.stages.blocking import segmented_pair_indices

    sz = np.asarray(sizes, dtype=np.int64)
    iu, ju = segmented_pair_indices(sz, cap=cap, window=window)
    # every pair is ordered and lands inside one group's index range
    assert (iu < ju).all()
    bounds = np.concatenate([[0], np.cumsum(sz)])
    grp_i = np.searchsorted(bounds, iu, side="right") - 1
    grp_j = np.searchsorted(bounds, ju, side="right") - 1
    assert (grp_i == grp_j).all()
    # small groups are paired exhaustively
    for gi, g in enumerate(sz):
        if 2 <= g <= cap:
            in_g = (grp_i == gi).sum()
            assert in_g == g * (g - 1) // 2


# --- minhash estimate tracks exact jaccard ------------------------------


@settings(max_examples=20, deadline=None)
@given(st.text(alphabet="abcdefg ", min_size=12, max_size=40),
       st.integers(0, 8))
def test_minhash_estimate_tracks_exact_jaccard(base, n_edits):
    from textgraphs_ray.functions.sketch import (jaccard_shingles,
                                                 minhash_batch)

    variant = base
    for i in range(n_edits):
        pos = (i * 7) % max(1, len(variant) - 1)
        variant = variant[:pos] + "z" + variant[pos + 1:]
    exact = jaccard_shingles(base, variant)
    sa, sb = minhash_batch([base, variant], num_perm=128)
    est = float((sa == sb).mean())
    assert abs(est - exact) < 0.2  # 128 perms → σ ≈ 0.044


# --- OSA distance basics ------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(st.text(alphabet="abcde", max_size=10),
       st.text(alphabet="abcde", max_size=10))
def test_osa_symmetric_and_bounded(a, b):
    from textgraphs_ray.functions.strsim import osa_distance

    d = osa_distance(a, b)
    assert d == osa_distance(b, a)
    assert d <= max(len(a), len(b))
    assert (d == 0) == (a == b)


# --- imaging codecs: encode∘decode = id for any image/signal ------------


@given(h=st.integers(1, 40), w=st.integers(1, 40), seed=st.integers(0, 99))
@settings(max_examples=30, deadline=None)
def test_ppm_bmp_roundtrip_any_shape(h, w, seed):
    from textgraphs_ray.functions import imaging

    img = np.random.RandomState(seed).randint(
        0, 256, (h, w, 3)).astype(np.uint8)
    assert np.array_equal(imaging.decode_ppm(imaging.encode_ppm(img)), img)
    assert np.array_equal(
        imaging.decode_bmp24(imaging.encode_bmp24(img)), img)


@given(n=st.integers(0, 2000), rate=st.sampled_from([8000, 16000, 44100]),
       seed=st.integers(0, 99))
@settings(max_examples=30, deadline=None)
def test_wav_roundtrip_any_length(n, rate, seed):
    from textgraphs_ray.functions import imaging

    s = (np.random.RandomState(seed).standard_normal(n)
         * 10000).astype(np.int16)
    s2, r2 = imaging.decode_wav_pcm16(imaging.encode_wav_pcm16(s, rate))
    assert np.array_equal(s, s2) and r2 == rate


# --- bottom-k sketch: merge is associative + layout-invariant -----------


@given(vals=st.lists(st.text(min_size=1, max_size=8), min_size=0,
                     max_size=60),
       cut=st.integers(0, 60), k=st.integers(1, 8))
@settings(max_examples=50, deadline=None)
def test_bottomk_merge_equals_direct(vals, cut, k):
    import hashlib

    def summarize(vs):
        return sorted({(hashlib.md5(v.encode()).hexdigest(), v)
                       for v in vs})[:k]

    cut = min(cut, len(vals))
    a, b = vals[:cut], vals[cut:]
    merged = sorted(set(summarize(a)) | set(summarize(b)))[:k]
    assert merged == summarize(vals)


# --- HLL: merge = union, estimate within theoretical error --------------


@given(n=st.integers(1, 3000), cut_frac=st.floats(0.0, 1.0),
       seed=st.integers(0, 20))
@settings(max_examples=30, deadline=None)
def test_hll_merge_equals_single_pass(n, cut_frac, seed):
    from textgraphs_ray.functions.hll import estimate, update_registers

    rng = np.random.RandomState(seed)
    vals = np.array([f"v{rng.randint(0, 10**9)}-{i}" for i in range(n)],
                    dtype=object)
    cut = int(n * cut_frac)
    full = np.zeros(4096, np.int8)
    update_registers(full, vals, 12)
    r1 = np.zeros(4096, np.int8)
    r2 = np.zeros(4096, np.int8)
    update_registers(r1, vals[:cut], 12)
    update_registers(r2, vals[cut:], 12)
    assert np.array_equal(np.maximum(r1, r2), full)
    est = estimate(full)
    # 5σ of the p=12 relative bound, plus a small absolute floor: at
    # tiny n a single register-index collision (P ≈ n²/2m per run)
    # makes linear counting undercount by ~1, which dwarfs the
    # relative bound long before the sketch's variance regime applies.
    assert abs(est - n) <= max(2.0, n * 5 * 1.04 / 64)


# --- GopherGate signals ≡ pure-python reference --------------------------


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(
    alphabet=st.sampled_from("abcdefg THE.a9 "), max_size=120),
    min_size=1, max_size=8))
def test_gopher_gate_matches_reference(texts):
    """The batch kernel equals a word-at-a-time reference on arbitrary
    text (mixed case, digits, punctuation, empties)."""
    import re

    from textgraphs_ray.stages.text import GopherGate

    batch = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
    got = GopherGate()(batch).to_pylist()
    for t, r in zip(texts, got):
        words = re.findall(r"[a-z]+", (t or "").lower())
        if not words:
            assert (r["n_words"], r["passes"]) == (0, 0)
            continue
        assert r["n_words"] == len(words)
        assert r["mean_wl"] == round(
            sum(map(len, words)) / len(words), 6)
        assert r["stop_hits"] == len(
            set(words) & {"a", "the", "of", "to", "and"})
        assert r["top_frac"] == round(
            max(words.count(w) for w in set(words)) / len(words), 6)
        want = int(20 <= r["n_words"] <= 90
                   and 3.5 <= r["mean_wl"] <= 6.0
                   and r["stop_hits"] >= 1 and r["top_frac"] <= 0.2)
        assert r["passes"] == want


# --- leakage_safe_split fence property ------------------------------------


@settings(max_examples=15, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 25), st.integers(0, 25)),
                max_size=30))
def test_leakage_split_fence_on_random_graphs(ray_session, raw_edges):
    """On ANY graph, no edge (≈ dup pair) straddles the split fence,
    and the assignment equals md5_frac of the brute-force component
    label."""
    import ray.data as rd

    from textgraphs_ray.stages.sampling import (leakage_safe_split,
                                                md5_frac)

    edges = sorted({(f"n{min(a, b)}", f"n{max(a, b)}")
                    for a, b in raw_edges if a != b})
    nodes = sorted({x for e in edges for x in e} | {"n99"})
    out = leakage_safe_split(
        rd.from_arrow(pa.table({"key": pa.array(nodes)})),
        rd.from_arrow(pa.table({
            "key_a": pa.array([a for a, _ in edges], pa.string()),
            "key_b": pa.array([b for _, b in edges], pa.string())})),
        splits={"train": 0.7, "test": 0.3}).take_all()
    split_of = {r["key"]: r["split"] for r in out}
    assert set(split_of) == set(nodes)
    for a, b in edges:                       # the fence
        assert split_of[a] == split_of[b], (a, b)
    comp = _brute_components(nodes, edges)
    for n in nodes:                          # exact md5 rule
        want = "train" if md5_frac([comp[n]])[0] < 0.7 else "test"
        assert split_of[n] == want, n
