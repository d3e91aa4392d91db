"""Meta-blocking (stages/metablock.py) vs a brute-force reference:
CBS graph, block purging, WEP / WNP pruning, ECBS weights."""

from __future__ import annotations

import itertools
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from textgraphs_ray.stages.metablock import (blocking_graph, ecbs_edges,
                                             node_block_counts, prune_wep,
                                             prune_wnp, shingle_blocks)

VOCAB = ["red", "blue", "green", "widget", "bolt", "ring", "spring",
         "lace", "small", "big"]


def _docs(n: int = 60, seed: int = 7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    texts = [" ".join(rng.choice(VOCAB, size=rng.integers(3, 12)))
             for _ in range(n)]
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})


def _brute_blocks(df: pd.DataFrame, shingle: int,
                  cap: int | None) -> dict[str, set]:
    blocks: dict[str, set] = {}
    for did, txt in zip(df["doc_id"], df["text"]):
        ws = txt.lower().split(" ")
        for i in range(len(ws) - shingle + 1):
            blocks.setdefault(" ".join(ws[i:i + shingle]), set()).add(did)
    if cap is not None:
        blocks = {b: m for b, m in blocks.items() if len(m) <= cap}
    return blocks


def _brute_cbs(blocks: dict[str, set]) -> dict[tuple, int]:
    w: dict[tuple, int] = {}
    for members in blocks.values():
        for a, b in itertools.combinations(sorted(members), 2):
            w[(a, b)] = w.get((a, b), 0) + 1
    return w


@pytest.mark.parametrize("cap", [None, 4])
def test_blocking_graph_matches_brute(cap):
    df = _docs()
    ds = ray.data.from_pandas(df)
    got = {(r["u"], r["v"]): r["w"]
           for r in blocking_graph(shingle_blocks(ds, shingle=3),
                                   max_block_size=cap).take_all()}
    want = _brute_cbs(_brute_blocks(df, 3, cap))
    assert got == want


def test_wep_keeps_edges_at_or_above_mean():
    df = _docs()
    edges = blocking_graph(shingle_blocks(ray.data.from_pandas(df),
                                          shingle=3), max_block_size=4)
    all_w = _brute_cbs(_brute_blocks(df, 3, 4))
    mean = sum(all_w.values()) / len(all_w)
    got = {(r["u"], r["v"]): r["w"] for r in prune_wep(edges).take_all()}
    want = {p: w for p, w in all_w.items() if w >= mean}
    assert got == want


def test_wnp_union_of_node_local_means():
    df = _docs()
    edges = blocking_graph(shingle_blocks(ray.data.from_pandas(df),
                                          shingle=3), max_block_size=4)
    all_w = _brute_cbs(_brute_blocks(df, 3, 4))
    incident: dict[int, list] = {}
    for (a, b), w in all_w.items():
        incident.setdefault(a, []).append(w)
        incident.setdefault(b, []).append(w)
    node_mean = {n: sum(ws) / len(ws) for n, ws in incident.items()}
    want = {p: w for p, w in all_w.items()
            if w >= node_mean[p[0]] or w >= node_mean[p[1]]}
    got = {(r["u"], r["v"]): r["w"] for r in prune_wnp(edges).take_all()}
    assert got == want


def test_ecbs_weights_match_brute():
    df = _docs()
    blocks = _brute_blocks(df, 3, 4)
    all_w = _brute_cbs(blocks)
    nb: dict[int, int] = {}
    for members in blocks.values():
        for d in members:
            nb[d] = nb.get(d, 0) + 1
    B = len(blocks)
    want = {p: round(w * math.log(B / nb[p[0]]) * math.log(B / nb[p[1]]), 6)
            for p, w in all_w.items()}
    bds = shingle_blocks(ray.data.from_pandas(df), shingle=3)
    got = {(r["u"], r["v"]): r["ecbs"]
           for r in ecbs_edges(bds, max_block_size=4).take_all()}
    assert got == pytest.approx(want)


def test_node_block_counts_after_purge():
    df = _docs()
    blocks = _brute_blocks(df, 3, 4)
    want: dict[int, int] = {}
    for members in blocks.values():
        for d in members:
            want[d] = want.get(d, 0) + 1
    bds = shingle_blocks(ray.data.from_pandas(df), shingle=3)
    got = {r["key"]: r["nb"]
           for r in node_block_counts(bds, max_block_size=4).take_all()}
    assert got == want


def test_block_filtering_keeps_smallest_blocks():
    from textgraphs_ray.stages.metablock import block_filtering

    df = _docs()
    blocks = _brute_blocks(df, 3, None)
    per_rec: dict[int, list] = {}
    for bg, members in blocks.items():
        for d in members:
            per_rec.setdefault(d, []).append((len(members), bg))
    want = set()
    for d, bs in per_rec.items():
        bs.sort()
        for size, bg in bs[:math.ceil(0.75 * len(bs))]:
            want.add((d, bg))
    bds = shingle_blocks(ray.data.from_pandas(df), shingle=3)
    got = {(r["key"], r["block"])
           for r in block_filtering(bds, ratio=0.75).take_all()}
    assert got == want


def test_cnp_union_of_node_topk():
    from textgraphs_ray.stages.metablock import prune_cnp

    df = _docs()
    edges = blocking_graph(shingle_blocks(ray.data.from_pandas(df),
                                          shingle=3), max_block_size=4)
    all_w = _brute_cbs(_brute_blocks(df, 3, 4))
    incident: dict[int, list] = {}
    for (a, b), w in all_w.items():
        incident.setdefault(a, []).append((-w, b, (a, b)))
        incident.setdefault(b, []).append((-w, a, (a, b)))
    k = 3
    want = set()
    for n, es in incident.items():
        es.sort()
        for _, _, p in es[:k]:
            want.add(p)
    got = {(r["u"], r["v"]): r["w"]
           for r in prune_cnp(edges, k=k).take_all()}
    assert set(got) == want
    assert all(got[p] == all_w[p] for p in got)


def test_empty_and_short_docs_yield_no_blocks():
    df = pd.DataFrame({"doc_id": np.array([0, 1], dtype=np.int64),
                       "text": ["", "two words"]})
    ds = ray.data.from_pandas(df)
    assert shingle_blocks(ds, shingle=3).count() == 0
    # blocking graph over an empty block table is empty, not an error
    assert blocking_graph(shingle_blocks(ds, shingle=3)).count() == 0


def test_segmented_pairs_arrow_blocks():
    """Pair producers must emit Arrow tables (pandas blocks make Ray's
    downstream aggregates ~20× slower)."""
    from textgraphs_ray.stages.triangle import _segmented_full_pairs

    df = pd.DataFrame({"b": [1, 1, 1, 2], "e": [10, 11, 12, 10]})
    out = _segmented_full_pairs(df, "b", "e")
    assert isinstance(out, pa.Table)
    assert out.num_rows == 3


def test_ecbs_node_plan_parity():
    # broadcast vs hash-partitioned-join node decoration must be
    # OUTPUT-IDENTICAL (the shared _ecbs expression, same 6dp values)
    df = _docs()
    bds = shingle_blocks(ray.data.from_pandas(df), shingle=3)
    want = sorted((r["u"], r["v"], r["w"], r["ecbs"]) for r in
                  ecbs_edges(bds, max_block_size=4,
                             node_plan="broadcast").take_all())
    got = sorted((r["u"], r["v"], r["w"], r["ecbs"]) for r in
                 ecbs_edges(bds, max_block_size=4,
                            node_plan="join").take_all())
    auto0 = sorted((r["u"], r["v"], r["w"], r["ecbs"]) for r in
                   ecbs_edges(bds, max_block_size=4,
                              broadcast_max=0).take_all())
    assert got == want == auto0 and len(want) > 0
