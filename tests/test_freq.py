"""functions/freq.py: Misra–Gries heavy hitters — exactness when
capacity >= ndv, the N/(capacity+1) error bound in the lossy regime,
and merge/block-layout invariance of the guarantees."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data as rd

from textgraphs_ray.functions.freq import mg_agg, mg_fold, mg_merge, top_k


def _zipf_values(n: int, seed: int = 7) -> list[str]:
    rng = np.random.default_rng(seed)
    ranks = rng.zipf(1.5, size=n)
    return [f"item{int(r) % 500}" for r in ranks]


class TestMisraGries:
    def test_exact_when_capacity_covers_ndv(self):
        vals = _zipf_values(20_000)
        acc = mg_fold({}, np.asarray(vals, dtype=object), capacity=1000)
        assert acc == dict(Counter(vals))

    def test_error_bound_lossy_regime(self):
        vals = _zipf_values(50_000)
        true = Counter(vals)
        cap = 16
        acc = mg_fold({}, np.asarray(vals, dtype=object), capacity=cap)
        bound = len(vals) / (cap + 1)
        for item, est in acc.items():
            assert est <= true[item] <= est + bound
        # every item more frequent than the bound must be retained
        for item, cnt in true.items():
            if cnt > bound:
                assert item in acc

    def test_merge_preserves_bound(self):
        vals = _zipf_values(30_000, seed=11)
        true = Counter(vals)
        cap = 32
        arr = np.asarray(vals, dtype=object)
        merged = {}
        for i in range(0, len(arr), 1709):  # uneven blocks
            part = mg_fold({}, arr[i:i + 1709], capacity=cap)
            merged = mg_merge(merged, part, capacity=cap)
        bound = len(vals) / (cap + 1)
        assert len(merged) <= cap
        for item, est in merged.items():
            assert est <= true[item] <= est + bound

    def test_dataset_aggregate_exact_any_block_layout(self):
        vals = _zipf_values(8_000, seed=3)
        true = Counter(vals)
        for blocks in (1, 4, 13):
            ds = rd.from_arrow(pa.table({"v": vals})).repartition(blocks)
            summary = ds.aggregate(
                mg_agg("v", capacity=600, alias_name="hh"))["hh"]
            assert dict(summary) == dict(true)
            # finalized order is deterministic: count desc, item asc
            keys = [(-c, k) for k, c in summary]
            assert keys == sorted(keys)

    def test_top_k(self):
        summary = [("a", 9), ("b", 5), ("c", 1)]
        assert top_k(summary, 2) == [("a", 9), ("b", 5)]
        assert top_k(summary, 10) == summary

    def test_grouped_aggregate_exact(self):
        """Grouped MG: per-group summaries survive the Arrow block
        round-trip between the map and reduce phases (the accumulator
        rides as pickled bytes — a dict would be rewritten into a
        struct over the union of keys with None gaps)."""
        rows = [{"g": f"g{i % 3}", "v": f"x{(i * 7) % 11}"}
                for i in range(3_000)]
        want: dict = {}
        for r in rows:
            want.setdefault(r["g"], Counter())[r["v"]] += 1
        ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(7)
        out = ds.groupby("g").aggregate(
            mg_agg("v", capacity=100, alias_name="hh")).take_all()
        assert len(out) == 3
        for r in out:
            assert dict(r["hh"]) == dict(want[r["g"]])
