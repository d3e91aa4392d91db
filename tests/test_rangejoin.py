"""Bucketed interval join (stages/join.py range_join)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from textgraphs_ray.stages.join import range_join

W = 100  # window in ts units


def _mk(ids, tss, extra=None):
    cols = {"id": pa.array(ids, pa.int64()),
            "ts": pa.array(tss, pa.int64())}
    if extra:
        cols.update(extra)
    return rd.from_arrow(pa.table(cols))


@pytest.fixture(scope="module")
def rng_data():
    rng = np.random.default_rng(7)
    p_ts = np.sort(rng.integers(0, 5000, 200)).tolist()
    b_ts = np.sort(rng.integers(0, 5000, 300)).tolist()
    probe = _mk(list(range(200)), p_ts)
    build = _mk(list(range(1000, 1300)), b_ts)
    return probe, build, p_ts, b_ts


def _brute_counts(p_ts, b_ts):
    b = np.asarray(b_ts)
    return {i: int(((b > t - W) & (b <= t)).sum())
            for i, t in enumerate(p_ts)}


def test_count_matches_brute_force(rng_data):
    probe, build, p_ts, b_ts = rng_data
    got = {r["id"]: r["n_matches"]
           for r in range_join(probe, build, probe_ts="ts",
                               build_ts="ts", window=W,
                               probe_cols=["id"]).take_all()}
    assert got == _brute_counts(p_ts, b_ts)


def test_interval_boundaries():
    # build at exactly t is IN (right-closed); at exactly t-w is OUT
    probe = _mk([0], [200])
    build = _mk([10, 11, 12], [100, 101, 200])
    got = range_join(probe, build, probe_ts="ts", build_ts="ts",
                     window=W, probe_cols=["id"]).take_all()
    assert got[0]["n_matches"] == 2  # 101 and 200; 100 == t-w excluded


def test_bucket_boundary_crossing():
    # probe in bucket 2 matching a build in bucket 1 (the replicated
    # copy) — the cross-bucket case the 2x replication exists for
    probe = _mk([0], [205])
    build = _mk([10], [199])
    got = range_join(probe, build, probe_ts="ts", build_ts="ts",
                     window=W, probe_cols=["id"]).take_all()
    assert got[0]["n_matches"] == 1


def test_left_semantics_zero_matches():
    probe = _mk([0, 1], [50, 4000])
    build = _mk([10], [45])
    got = {r["id"]: r["n_matches"]
           for r in range_join(probe, build, probe_ts="ts",
                               build_ts="ts", window=W,
                               probe_cols=["id"]).take_all()}
    assert got == {0: 1, 1: 0}


def test_pairs_mode(rng_data):
    probe, build, p_ts, b_ts = rng_data
    got = range_join(probe, build, probe_ts="ts", build_ts="ts",
                     window=W, probe_cols=["id"],
                     build_cols=["id"], emit="pairs").take_all()
    # brute: every (probe, build) with b in (t-w, t]
    exp = set()
    for i, t in enumerate(p_ts):
        for j, s in enumerate(b_ts):
            if t - W < s <= t:
                exp.add((i, 1000 + j))
    # build ids are position-mapped through the sorted permutation;
    # compare as multiset of (probe, build) pairs — ts ties among
    # builds share a timestamp so identity is ambiguous only between
    # equal-ts rows; map pairs through ts values instead
    b_ts_by_id = {1000 + j: s for j, s in enumerate(b_ts)}
    exp_ts = sorted((p_ts[i], b_ts_by_id[b]) for i, b in exp)
    got_ts = sorted((p_ts[r["id"]], b_ts_by_id[r["id_2"]])
                    if "id_2" in r else (p_ts[r["id"]], None)
                    for r in got)
    assert len(got) == len(exp)
    assert got_ts == exp_ts


def test_pairs_requires_build_cols():
    probe = _mk([0], [10])
    with pytest.raises(ValueError):
        range_join(probe, probe, probe_ts="ts", build_ts="ts",
                   window=W, probe_cols=["id"], emit="pairs")
