"""Count-min sketch (functions/cms.py)."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from textgraphs_ray.functions.cms import cms_agg, cms_estimate


def _vals(n=5000, seed=5):
    rng = np.random.default_rng(seed)
    # zipf-ish: few heavy items, long tail
    return [f"item{int(v)}" for v in rng.zipf(1.6, n)]


def _sketch(vals, width, depth, blocks=7):
    ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.string())}))
    return ds.repartition(blocks).aggregate(
        cms_agg("v", width=width, depth=depth, alias_name="s"))["s"]


def test_lower_bound_and_error_bound():
    vals = _vals()
    truth = Counter(vals)
    width, depth = 512, 4
    sk = _sketch(vals, width, depth)
    items = sorted(truth)
    est = cms_estimate(sk, items, width=width, depth=depth)
    n = len(vals)
    for it, e in zip(items, est):
        assert e >= truth[it]                       # never undercounts
        assert e <= truth[it] + 2 * (2 * n / width)  # CM error bound


def test_merge_and_layout_invariance():
    vals = _vals(3000, seed=9)
    a = _sketch(vals, 256, 3, blocks=2)
    b = _sketch(vals, 256, 3, blocks=13)
    assert a == b  # same bytes regardless of block layout


def test_wide_sketch_is_exact_on_few_items():
    vals = ["a"] * 10 + ["b"] * 5 + ["c"] * 2
    sk = _sketch(vals, 4096, 4, blocks=3)
    est = cms_estimate(sk, ["a", "b", "c", "zzz"], width=4096, depth=4)
    assert est.tolist() == [10, 5, 2, 0]


def test_rejects_bad_params():
    with pytest.raises(ValueError):
        cms_agg("v", width=0)
