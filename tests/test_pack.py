"""Tests for training-data export operators (stages/pack.py):
greedy sequence packing and deterministic shard assignment."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from textgraphs_ray.stages.pack import (greedy_bins, md5_shard,
                                        pack_greedy, shard_assign)


def greedy_bins_ref(lengths, budget):
    """Sequential reference: new bin when running + x would exceed."""
    bins, b, running = [], 0, 0
    for i, x in enumerate(lengths):
        if i == 0:
            running = x
        elif running + x > budget:
            b += 1
            running = x
        else:
            running += x
        bins.append(b)
    return np.array(bins, dtype=np.int64)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_greedy_bins_matches_sequential_reference(seed):
    rng = np.random.RandomState(seed)
    lengths = rng.randint(1, 1500, size=200)
    got = greedy_bins(lengths, 2000)
    assert np.array_equal(got, greedy_bins_ref(lengths, 2000))


def test_greedy_bins_invariants():
    lengths = np.array([500, 600, 1000, 2500, 100, 100])
    bins = greedy_bins(lengths, 2000)
    # bins are consecutive starting at 0
    assert bins[0] == 0
    assert set(np.diff(bins)) <= {0, 1}
    # every bin except oversize singletons fits the budget
    for b in np.unique(bins):
        members = lengths[bins == b]
        assert members.sum() <= 2000 or len(members) == 1
    # oversize doc is alone in its bin
    assert (bins == bins[3]).sum() == 1
    assert len(greedy_bins(np.array([], dtype=np.int64), 10)) == 0


def test_pack_greedy_groups_independent():
    rows = [{"doc_id": i, "source": f"s{i % 3}", "n_chars": 700 + i}
            for i in range(30)]
    out = (pack_greedy(rd.from_arrow(pa.Table.from_pylist(rows)),
                       budget=2000, group_col="source")
           .to_pandas().sort_values(["source", "doc_id"]))
    for src, g in out.groupby("source"):
        expect = greedy_bins_ref(g["n_chars"].to_numpy(), 2000)
        assert np.array_equal(g["bin_id"].to_numpy(), expect), src


def test_md5_shard_matches_duckdb():
    import duckdb

    ids = list(range(50))
    ours = md5_shard(ids, 8)
    theirs = duckdb.sql(
        "SELECT (('0x' || substr(md5(i::VARCHAR), 1, 8))::UBIGINT % 8)"
        "::BIGINT AS s FROM (SELECT unnest(range(50)) AS i)"
    ).fetchnumpy()["s"]
    assert np.array_equal(ours, theirs)


def test_shard_assign_deterministic_across_layouts():
    rows = [{"doc_id": i} for i in range(100)]
    t = pa.Table.from_pylist(rows)
    a = (shard_assign(rd.from_arrow(t), n_shards=4)
         .to_pandas().sort_values("doc_id"))
    b = (shard_assign(rd.from_arrow(t).repartition(7), n_shards=4)
         .to_pandas().sort_values("doc_id"))
    assert np.array_equal(a["shard"].to_numpy(), b["shard"].to_numpy())
    assert set(a["shard"]) <= set(range(4))
