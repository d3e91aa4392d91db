"""stages/join.py: shuffle_join + broadcast_join semantics, including
the empty-shuffle-partition regression Ray's native hash join fails
(repo invariant, CLAUDE.md)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from textgraphs_ray.stages.join import broadcast_join, shuffle_join


def _ds(rows: list[dict]) -> "rd.Dataset":
    return rd.from_arrow(pa.Table.from_pylist(rows))


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


class TestShuffleJoin:
    def test_inner_matches_pandas_merge(self):
        left = [{"k": i % 7, "a": i} for i in range(50)]
        right = [{"k": i % 5, "b": i * 10} for i in range(20)]
        got = shuffle_join(_ds(left), _ds(right), "k", "k", 4).to_pandas()
        want = pd.DataFrame(left).merge(pd.DataFrame(right), on="k")
        assert _sorted(got).equals(_sorted(want))

    def test_differing_key_names_and_project(self):
        left = [{"lk": i, "a": i} for i in range(10)]
        right = [{"rk": i, "b": -i} for i in range(5, 15)]
        got = shuffle_join(_ds(left), _ds(right), "lk", "rk", 3,
                           lambda m: m[["a", "b"]]).to_pandas()
        assert sorted(got.columns) == ["a", "b"]
        assert sorted(got["a"]) == list(range(5, 10))

    def test_left_join_keeps_unmatched(self):
        left = [{"k": i, "a": i} for i in range(6)]
        right = [{"k": i, "b": i} for i in range(3)]
        got = shuffle_join(_ds(left), _ds(right), "k", "k", 2,
                           how="left").to_pandas()
        assert len(got) == 6
        assert got[got["k"] >= 3]["b"].isna().all()

    def test_sparse_keys_high_partitions(self):
        """The empty-partition case that crashes Ray's native hash
        join: 2 distinct keys spread across 64 partitions."""
        left = [{"k": k, "a": 1} for k in ("x", "y")]
        right = [{"k": k, "b": 2} for k in ("y", "z")]
        got = shuffle_join(_ds(left), _ds(right), "k", "k", 64).to_pandas()
        assert list(got["k"]) == ["y"]

    def test_string_and_int_keys(self):
        left = [{"k": f"s{i}", "a": i} for i in range(9)]
        right = [{"k": f"s{i}", "b": i} for i in range(0, 18, 2)]
        got = shuffle_join(_ds(left), _ds(right), "k", "k", 5).to_pandas()
        assert sorted(got["a"]) == [0, 2, 4, 6, 8]

    def test_empty_schemaless_right(self):
        """A fully-filtered Dataset has schema() None — the curate_join
        regression: anti passes left through, semi/inner go empty."""
        import pytest

        left = [{"k": f"s{i}", "a": i} for i in range(6)]
        empty = _ds([{"k": "x", "b": 1}]).filter(lambda r: False)
        assert empty.schema() is None
        anti = shuffle_join(_ds(left), empty, "k", "k", 4,
                            how="anti").to_pandas()
        assert sorted(anti["a"]) == list(range(6))
        for how in ("semi", "inner"):
            got = shuffle_join(_ds(left), empty, "k", "k", 4, how=how)
            assert got.count() == 0
            # Dataset-level schema keeps left's columns (Ray's
            # to_pandas() drops columns for ANY empty dataset)
            assert sorted(got.schema().names) == ["a", "k"]
        with pytest.raises(ValueError, match="schema"):
            shuffle_join(_ds(left), empty, "k", "k", 4, how="left")

    def test_empty_schemaless_left(self):
        left = _ds([{"k": "x", "a": 1}]).filter(lambda r: False)
        right = [{"k": f"s{i}", "b": i} for i in range(4)]
        for how in ("inner", "anti", "semi", "left"):
            got = shuffle_join(left, _ds(right), "k", "k", 4, how=how)
            assert got.count() == 0


class TestBroadcastJoin:
    def _build(self):
        return pa.table({"nk": pa.array([1, 2, 3], pa.int64()),
                         "name": ["ar", "br", "ca"]})

    def test_inner_drops_unmatched(self):
        probe = _ds([{"nk": i % 5, "v": i} for i in range(20)])
        got = broadcast_join(probe, self._build(), on="nk").to_pandas()
        assert set(got["nk"]) == {1, 2, 3}
        want_names = {1: "ar", 2: "br", 3: "ca"}
        assert all(want_names[k] == n
                   for k, n in zip(got["nk"], got["name"]))

    def test_left_keeps_unmatched_with_nulls(self):
        probe = _ds([{"nk": i, "v": i} for i in range(5)])
        got = broadcast_join(probe, self._build(), on="nk",
                             how="left").to_pandas()
        assert len(got) == 5
        assert got[got["nk"].isin([0, 4])]["name"].isna().all()

    def test_differing_key_names_and_column_projection(self):
        build = pa.table({"bk": [10, 20], "x": ["a", "b"],
                          "y": [1.0, 2.0]})
        probe = _ds([{"k": 10}, {"k": 20}, {"k": 30}])
        got = broadcast_join(probe, build, on="k", build_on="bk",
                             columns=["x"]).to_pandas()
        assert sorted(got.columns) == ["k", "x"]
        assert list(got.sort_values("k")["x"]) == ["a", "b"]

    def test_matches_pandas_merge_on_random_data(self):
        rng = np.random.default_rng(11)
        probe_rows = [{"k": int(k), "v": i}
                      for i, k in enumerate(rng.integers(0, 30, 200))]
        build = pa.table({"k": pa.array(range(0, 30, 3), pa.int64()),
                          "w": [f"w{i}" for i in range(10)]})
        got = broadcast_join(_ds(probe_rows), build, on="k").to_pandas()
        want = pd.DataFrame(probe_rows).merge(build.to_pandas(), on="k")
        assert _sorted(got).equals(_sorted(want))


class TestReviewRegressions:
    def test_shuffle_join_default_project_keeps_both_keys(self):
        """Documented default: pandas-merge semantics — both key
        columns survive when names differ."""
        left = [{"lk": i, "a": i} for i in range(4)]
        right = [{"rk": i, "b": i} for i in range(4)]
        got = shuffle_join(_ds(left), _ds(right), "lk", "rk",
                           2).to_pandas()
        assert sorted(got.columns) == ["a", "b", "lk", "rk"]

    def test_broadcast_join_columns_may_include_key(self):
        build = pa.table({"k": [1, 2], "x": ["a", "b"]})
        probe = _ds([{"k": 1}, {"k": 2}])
        got = broadcast_join(probe, build, on="k",
                             columns=["k", "x"]).to_pandas()
        assert sorted(got.columns) == ["k", "x"]

    def test_broadcast_join_empty_columns_is_semijoin(self):
        build = pa.table({"k": [1], "x": ["a"]})
        probe = _ds([{"k": 1, "v": 9}, {"k": 2, "v": 8}])
        got = broadcast_join(probe, build, on="k",
                             columns=[]).to_pandas()
        assert sorted(got.columns) == ["k", "v"]
        assert list(got["k"]) == [1]

    def test_broadcast_join_unknown_column_raises(self):
        import pytest

        build = pa.table({"k": [1], "x": ["a"]})
        with pytest.raises(ValueError, match="nope"):
            broadcast_join(_ds([{"k": 1}]), build, on="k",
                           columns=["nope"])


def test_salted_join_parity_on_skewed_keys():
    """salted_join ≡ shuffle_join on data where one key is 90% of the
    left side, for every `how` — salting only re-partitions work."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from textgraphs_ray.stages.join import salted_join, shuffle_join

    rng = np.random.default_rng(11)
    keys = np.where(rng.random(500) < 0.9, 7,
                    rng.integers(0, 20, 500)).astype(np.int64)
    # string columns on BOTH sides: the round-3 crash (pa.nulls fed a
    # numpy dtype from a pandas-block schema) only fired when a string
    # column needed null-padding through the union
    left = rd.from_arrow(pa.table({
        "k": pa.array(keys),
        "v": pa.array(np.arange(500, dtype=np.int64)),
        "name": pa.array([f"cust#{i}" for i in range(500)])}))
    right = rd.from_arrow(pa.table({
        "rk": pa.array([5, 7, 9, 13], pa.int64()),
        "w": pa.array([50, 70, 90, 130], pa.int64()),
        "tag": pa.array(["e", "g", "i", "m"])}))

    def rows(ds, cols):
        return sorted(tuple(r[c] for c in cols) for r in ds.take_all())

    for how, cols in (("inner", ["k", "v", "name", "w", "tag"]),
                      ("left", ["k", "v", "name"]),
                      ("semi", ["k", "v", "name"]),
                      ("anti", ["k", "v", "name"])):
        base = shuffle_join(left, right, "k", "rk", 4, how=how)
        salted = salted_join(left, right, "k", "rk", 4, salts=3,
                             how=how)
        assert rows(salted, cols) == rows(base, cols), how


def test_salted_join_same_name_key_drops_right_copy():
    import pyarrow as pa
    import ray.data as rd

    from textgraphs_ray.stages.join import salted_join

    left = rd.from_arrow(pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                                   "v": pa.array([10, 11, 20],
                                                 pa.int64())}))
    right = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64()),
                                    "w": pa.array([100], pa.int64())}))
    out = salted_join(left, right, "k", "k", 2, salts=2).take_all()
    assert sorted(r["v"] for r in out) == [10, 11]
    assert all(set(r) == {"k", "v", "w"} for r in out)


def test_shuffle_join_outer(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from textgraphs_ray.stages.join import shuffle_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "a": pa.array(["x", "y", "z"])}))
    right = rd.from_arrow(pa.table({
        "k2": pa.array([2, 3, 4], pa.int64()),
        "b": pa.array([20, 30, 40], pa.int64())}))
    out = shuffle_join(left, right, "k", "k2", 4,
                       how="outer").to_pandas()
    # 2 matched + 1 left-only + 1 right-only
    assert len(out) == 4
    key = out["k"].fillna(out["k2"])
    got = {int(k): (a, b) for k, a, b in
           zip(key, out["a"], out["b"])}
    assert got[1][0] == "x" and pd.isna(got[1][1])
    assert got[2] == ("y", 20) and got[3] == ("z", 30)
    assert pd.isna(got[4][0]) and got[4][1] == 40


def test_shuffle_join_outer_empty_right_raises(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from textgraphs_ray.stages.join import shuffle_join

    left = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64())}))
    empty = rd.from_arrow(pa.table({
        "k2": pa.array([1], pa.int64())})).filter(lambda r: False)
    with pytest.raises(ValueError):
        shuffle_join(left, empty.materialize(), "k", "k2", 2,
                     how="outer")
