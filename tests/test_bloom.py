"""functions/bloom.py + stages/join.py bloom_anti_join: no false
negatives, bounded false positives, block-layout-invariant aggregate
build, and exact anti-join semantics despite Bloom false positives."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from textgraphs_ray.functions.bloom import (bloom_agg, bloom_contains,
                                            bloom_insert, bloom_params)
from textgraphs_ray.stages.join import bloom_anti_join, shuffle_join


def _ds(rows: list[dict]) -> "rd.Dataset":
    return rd.from_arrow(pa.Table.from_pylist(rows))


class TestBloomPrimitives:
    def test_no_false_negatives(self):
        m_bits, k = bloom_params(5_000, 0.01)
        bm = np.zeros(m_bits // 8, np.uint8)
        keys = np.asarray([f"key-{i}" for i in range(5_000)], dtype=object)
        bloom_insert(bm, keys, k)
        assert bloom_contains(bm, keys, k).all()

    def test_false_positive_rate_near_design(self):
        m_bits, k = bloom_params(10_000, 0.01)
        bm = np.zeros(m_bits // 8, np.uint8)
        members = np.asarray([f"in-{i}" for i in range(10_000)], dtype=object)
        bloom_insert(bm, members, k)
        probes = np.asarray([f"out-{i}" for i in range(20_000)], dtype=object)
        fp = bloom_contains(bm, probes, k).mean()
        assert fp < 0.05  # designed 1%, generous margin

    def test_params_sizing(self):
        m, k = bloom_params(1_000_000, 0.01)
        assert 9_000_000 < m < 11_000_000  # ~9.6 bits/key
        assert 5 <= k <= 9
        m0, k0 = bloom_params(0)
        assert m0 >= 64 and k0 >= 1

    def test_agg_matches_driver_insert_any_block_layout(self):
        vals = [f"v{i % 700}" for i in range(4_000)]
        m_bits, k = bloom_params(700, 0.01)
        want = bloom_insert(np.zeros(m_bits // 8, np.uint8),
                            np.asarray(vals, dtype=object), k)
        for blocks in (1, 5, 17):
            ds = rd.from_arrow(pa.table({"v": vals})).repartition(blocks)
            got = ds.aggregate(
                bloom_agg("v", m_bits=m_bits, k=k, alias_name="bm"))["bm"]
            assert np.array_equal(got, want)

    def test_int_keys(self):
        m_bits, k = bloom_params(100, 0.01)
        bm = np.zeros(m_bits // 8, np.uint8)
        bloom_insert(bm, np.arange(100), k)
        assert bloom_contains(bm, np.arange(100), k).all()


class TestShuffleJoinSemiAnti:
    def test_semi_and_anti_partition_left(self):
        left = [{"k": i, "a": i * 2} for i in range(20)]
        right = [{"k": i, "b": 1} for i in range(0, 20, 3)]
        semi = shuffle_join(_ds(left), _ds(right), "k", "k", 4,
                            how="semi").to_pandas()
        anti = shuffle_join(_ds(left), _ds(right), "k", "k", 4,
                            how="anti").to_pandas()
        assert sorted(semi.columns) == ["a", "k"]  # left columns only
        assert sorted(semi["k"]) == list(range(0, 20, 3))
        assert sorted(anti["k"]) == [i for i in range(20) if i % 3]
        assert len(semi) + len(anti) == len(left)

    def test_anti_duplicate_right_keys(self):
        left = [{"k": "x", "a": 1}, {"k": "y", "a": 2}]
        right = [{"k": "x", "b": i} for i in range(5)]
        anti = shuffle_join(_ds(left), _ds(right), "k", "k", 2,
                            how="anti").to_pandas()
        assert list(anti["k"]) == ["y"]  # no row multiplication


class TestBloomAntiJoin:
    def test_matches_exact_anti_join(self):
        rng = np.random.default_rng(42)
        left = [{"k": f"u{int(i)}", "payload": int(i)}
                for i in rng.integers(0, 3_000, 2_000)]
        right = [{"rk": f"u{int(i)}"}
                 for i in rng.integers(0, 3_000, 1_500)]
        got = bloom_anti_join(_ds(left), _ds(right), "k", "rk",
                              num_partitions=8).to_pandas()
        rkeys = {r["rk"] for r in right}
        want = pd.DataFrame([r for r in left if r["k"] not in rkeys])
        assert sorted(got.columns) == ["k", "payload"]
        got_s = got.sort_values(["k", "payload"]).reset_index(drop=True)
        want_s = want[["k", "payload"]].sort_values(
            ["k", "payload"]).reset_index(drop=True)
        assert got_s.equals(want_s)

    def test_disjoint_sides_all_kept(self):
        left = [{"k": f"a{i}", "v": i} for i in range(50)]
        right = [{"k": f"b{i}"} for i in range(50)]
        got = bloom_anti_join(_ds(left), _ds(right), "k", "k",
                              num_partitions=4).to_pandas()
        assert len(got) == 50

    def test_full_overlap_all_dropped(self):
        left = [{"k": i, "v": i} for i in range(30)]
        right = [{"k": i} for i in range(30)]
        got = bloom_anti_join(_ds(left), _ds(right), "k", "k",
                              num_partitions=4).to_pandas()
        assert len(got) == 0

    def test_tiny_filter_forces_false_positives(self):
        """With a deliberately undersized filter most probes are Bloom
        false positives — the verify join must still return the exact
        answer."""
        left = [{"k": f"L{i}", "v": i} for i in range(200)]
        right = [{"k": f"R{i}"} for i in range(200)]
        got = bloom_anti_join(_ds(left), _ds(right), "k", "k",
                              expected=2, fp_rate=0.5,
                              num_partitions=4).to_pandas()
        assert len(got) == 200  # disjoint keys: everything survives
