"""Interval-overlap join (stages/join.py) and kNN classify
(stages/similarity.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from textgraphs_ray.stages.join import interval_overlap_join
from textgraphs_ray.stages.similarity import knn_classify


def _iv_ds(rows):
    return rd.from_arrow(pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "i": pa.array([r[1] for r in rows], pa.int64()),
        "s": pa.array([r[2] for r in rows], pa.int64()),
        "e": pa.array([r[3] for r in rows], pa.int64())}))


def _brute_overlap(a_rows, b_rows):
    out = []
    for ka, ia, sa, ea in a_rows:
        for kb, ib, sb, eb in b_rows:
            if ka == kb and sa <= eb and sb <= ea:
                out.append((ka, ia, ib, min(ea, eb) - max(sa, sb)))
    return sorted(out)


def _rand_intervals(seed, n, id0=0, n_keys=4, span=1000, max_len=300):
    rng = np.random.default_rng(seed)
    rows = []
    for j in range(n):
        s = int(rng.integers(0, span))
        rows.append((int(rng.integers(0, n_keys)), id0 + j, s,
                     s + int(rng.integers(0, max_len))))
    return rows


@pytest.mark.parametrize("cell", [50, 128, 10_000])
def test_overlap_join_matches_brute(cell):
    # cell=50 forces multi-cell replication (lengths up to 300);
    # cell=10_000 puts everything in one cell — same answer both ways
    a = _rand_intervals(7, 40)
    b = _rand_intervals(8, 40, id0=1000)
    got = sorted((r["k"], r["a_id"], r["b_id"], r["overlap"])
                 for r in interval_overlap_join(
                     _iv_ds(a), _iv_ds(b), key="k", id_col="i",
                     start="s", end="e", cell=cell).take_all())
    assert got == _brute_overlap(a, b)


def test_overlap_join_anchor_dedup_exactly_once():
    # one long a interval overlapping one long b across many cells:
    # must appear exactly once despite ~20 shared cells
    a = [(1, 1, 0, 1000)]
    b = [(1, 2, 500, 1500)]
    got = interval_overlap_join(_iv_ds(a), _iv_ds(b), key="k",
                                id_col="i", start="s", end="e",
                                cell=50).take_all()
    assert [(r["k"], r["a_id"], r["b_id"], r["overlap"])
            for r in got] == [(1, 1, 2, 500)]


def test_overlap_join_disjoint_keys_and_times():
    a = [(1, 1, 0, 10), (2, 2, 0, 10)]
    b = [(1, 3, 11, 20), (3, 4, 0, 10)]  # adjacent-but-after; other key
    assert interval_overlap_join(_iv_ds(a), _iv_ds(b), key="k",
                                 id_col="i", start="s", end="e",
                                 cell=8).take_all() == []


def test_overlap_join_touching_endpoints_count():
    # inclusive endpoints: e_a == s_b is an overlap of length 0
    a = [(1, 1, 0, 10)]
    b = [(1, 2, 10, 20)]
    got = interval_overlap_join(_iv_ds(a), _iv_ds(b), key="k",
                                id_col="i", start="s", end="e",
                                cell=4).take_all()
    assert [(r["a_id"], r["b_id"], r["overlap"])
            for r in got] == [(1, 2, 0)]


def _emb_ds(vecs, labels):
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())}))


def test_knn_classify_planted_clusters():
    rng = np.random.default_rng(5)
    centers = np.eye(3, 16) * 10
    vecs, labels = [], []
    for j in range(60):
        lab = j % 3
        vecs.append(centers[lab] + rng.normal(0, 0.05, 16))
        labels.append(lab)
    out = knn_classify(_emb_ds(vecs, labels), k=5, n_queries=60)
    got = {r["vec_id"]: (r["pred_label"], r["votes"])
           for r in out.to_pylist()}
    assert all(got[j] == (j % 3, 5) for j in range(60))


def test_knn_classify_vote_tie_prefers_smaller_label():
    # query 0 at origin-ish; neighbors: two of label 1, two of label 2
    # (k=4) at identical distances → tie → label 1
    base = np.zeros(8)
    base[0] = 1.0
    vecs = [base]
    labels = [9]
    for ang, lab in ((0.1, 2), (-0.1, 2), (0.2, 1), (-0.2, 1)):
        v = np.zeros(8)
        v[0] = np.cos(ang)
        v[1] = np.sin(ang)
        vecs.append(v)
        labels.append(lab)
    out = knn_classify(_emb_ds(vecs, labels), k=4, n_queries=1)
    [r] = out.to_pylist()
    assert (r["vec_id"], r["pred_label"], r["votes"]) == (0, 1, 2)


def test_knn_classify_matches_brute_vote():
    rng = np.random.default_rng(11)
    vecs = rng.normal(0, 1, (80, 12))
    labels = rng.integers(0, 4, 80).tolist()
    out = {r["vec_id"]: r["pred_label"] for r in knn_classify(
        _emb_ds(vecs, labels), k=5, n_queries=30).to_pylist()}
    # mirror the stage: values stored float32, scored in float64
    stored = vecs.astype(np.float32).astype(np.float64)
    vn = stored / np.linalg.norm(stored, axis=1, keepdims=True)
    sims = vn @ vn.T
    for q in range(30):
        order = sorted((-(sims[q, j]), j) for j in range(80) if j != q)
        top = [labels[j] for _, j in order[:5]]
        best = sorted(((-top.count(l), l) for l in set(top)))[0][1]
        assert out[q] == best


def test_peak_concurrency_closed_form():
    import pyarrow as pa
    import ray.data as rd

    from textgraphs_ray.stages.sweep import peak_concurrency

    # [0,10] [5,15] [8,9] overlap at t=8 (3 open); [20,21] alone
    rows = [(0, 10), (5, 15), (8, 9), (20, 21)]
    ds = rd.from_arrow(pa.table({
        "s": pa.array([r[0] for r in rows], pa.int64()),
        "e": pa.array([r[1] for r in rows], pa.int64())}))
    [r] = peak_concurrency(ds, start="s", end="e",
                           bucket=4).take_all()
    assert (r["peak"], r["t_peak"]) == (3, 8)


def test_peak_concurrency_matches_brute():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from textgraphs_ray.stages.sweep import peak_concurrency

    rng = np.random.default_rng(3)
    s = rng.integers(0, 1000, 300)
    e = s + rng.integers(0, 80, 300)
    ds = rd.from_arrow(pa.table({"s": pa.array(s.astype("int64")),
                                 "e": pa.array(e.astype("int64"))}))
    [r] = peak_concurrency(ds, start="s", end="e",
                           bucket=97).take_all()
    # brute sweep over distinct times
    deltas: dict[int, int] = {}
    for a, z in zip(s, e):
        deltas[int(a)] = deltas.get(int(a), 0) + 1
        deltas[int(z) + 1] = deltas.get(int(z) + 1, 0) - 1
    run = 0
    best, best_t = 0, None
    for t in sorted(deltas):
        run += deltas[t]
        if run > best:
            best, best_t = run, t
    assert (r["peak"], r["t_peak"]) == (best, best_t)
