"""distinct_set_op (stages/join.py) and percent_rank (stages/stats.py)."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from textgraphs_ray.stages.join import distinct_set_op
from textgraphs_ray.stages.stats import percent_rank


def _ds(rows, cols=("k",)):
    return rd.from_arrow(pa.table(
        {c: pa.array([r[i] for r in rows])
         for i, c in enumerate(cols)}))


def test_intersect_and_except_distinct_semantics():
    left = _ds([(1,), (1,), (2,), (3,)])     # duplicates collapse
    right = _ds([(2,), (4,), (2,)])
    inter = sorted(r["k"] for r in
                   distinct_set_op(left, right, ["k"],
                                   op="intersect").take_all())
    exc = sorted(r["k"] for r in
                 distinct_set_op(left, right, ["k"],
                                 op="except").take_all())
    assert inter == [2]
    assert exc == [1, 3]


def test_multi_column_set_op():
    left = _ds([("a", 1), ("a", 2), ("b", 1)], cols=("g", "v"))
    right = _ds([("a", 2), ("b", 2)], cols=("g", "v"))
    inter = sorted((r["g"], r["v"]) for r in
                   distinct_set_op(left, right, ["g", "v"],
                                   op="intersect").take_all())
    assert inter == [("a", 2)]


def test_set_op_rejects_bad_op():
    ds = _ds([(1,)])
    with pytest.raises(ValueError):
        distinct_set_op(ds, ds, ["k"], op="union")


def test_percent_rank_with_ties():
    ds = rd.from_arrow(pa.table({
        "id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "v": pa.array([10, 20, 20, 30, 40], pa.int64())}))
    got = {r["id"]: r["pr"]
           for r in percent_rank(ds, value_col="v",
                                 id_col="id").take_all()}
    # ranks: 10→1, 20→2 (both), 30→4, 40→5; pr = (rank-1)/4
    assert got == {0: 0.0, 1: 0.25, 2: 0.25, 3: 0.75, 4: 1.0}


def test_percent_rank_single_row_and_guard():
    one = rd.from_arrow(pa.table({"id": pa.array([0], pa.int64()),
                                  "v": pa.array([7], pa.int64())}))
    assert percent_rank(one, value_col="v",
                        id_col="id").take_all()[0]["pr"] == 0.0
    many = rd.from_arrow(pa.table({
        "id": pa.array(range(10), pa.int64()),
        "v": pa.array(range(10), pa.int64())}))
    with pytest.raises(ValueError):
        percent_rank(many, value_col="v", id_col="id",
                     max_distinct=5).take_all()


# ---- ntile (stages/stats.py) ----------------------------------------

from textgraphs_ray.stages.stats import ntile  # noqa: E402


def _sql_ntile(vals, k):
    """Reference ntile over rows sorted by (value, id)."""
    order = sorted(range(len(vals)), key=lambda i: (vals[i], i))
    n = len(vals)
    base, rem = divmod(n, k)
    out = {}
    r = 0
    for b in range(1, k + 1):
        size = base + (1 if b <= rem else 0)
        for _ in range(size):
            if r < n:
                out[order[r]] = b
                r += 1
    return out


@pytest.mark.parametrize("k,n", [(4, 23), (8, 8), (3, 2), (5, 100)])
def test_ntile_matches_sql_semantics(ray_session, k, n):
    import numpy as np
    rng = np.random.default_rng(n)
    vals = rng.integers(0, 6, n).tolist()   # heavy ties
    ds = _ds([(i, v) for i, v in enumerate(vals)],
             cols=("id", "v")).repartition(4)
    got = {r["id"]: r["bucket"]
           for r in ntile(ds, value_col="v", id_col="id",
                          k=k).take_all()}
    assert got == _sql_ntile(vals, k)


@pytest.mark.parametrize("k", [2, 3, 4])
def test_grouped_ntile_matches_per_group_sql(ray_session, k):
    import numpy as np

    from textgraphs_ray.stages.stats import grouped_ntile

    rng = np.random.default_rng(k)
    rows = [(i, ["en", "zh", "fr"][i % 3], int(v))
            for i, v in enumerate(rng.integers(0, 5, 120))]
    ds = _ds(rows, cols=("id", "g", "v")).repartition(4)
    got = {(r["g"], r["id"]): r["bucket"]
           for r in grouped_ntile(ds, value_col="v", id_col="id",
                                  group_col="g", k=k).take_all()}
    want = {}
    for gname in ("en", "zh", "fr"):
        ids = [i for i, g, _ in rows if g == gname]
        vals = [v for _, g, v in rows if g == gname]
        ref = _sql_ntile(vals, k)
        for local, i in enumerate(ids):
            want[(gname, i)] = ref[local]
    assert got == want
