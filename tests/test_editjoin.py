"""stages/editjoin.py: FastSS edit-distance join — brute-force parity
at k=1 and k=2, lev_within DP edge cases (the equal-length ins+del
trap), and empty/degenerate inputs."""

from __future__ import annotations

import random

import pyarrow as pa
import ray.data as rd

from textgraphs_ray.stages.editjoin import (deletion_variants,
                                            edit_distance_join,
                                            lev_within)


def _lev_full(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j - 1] + cost, prev[j] + 1, cur[j - 1] + 1)
        prev = cur
    return prev[lb]


def test_lev_within_matches_full_dp():
    rng = random.Random(7)
    alpha = "ab c"
    for _ in range(400):
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 8)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 8)))
        for k in (1, 2, 3):
            true = _lev_full(a, b)
            got = lev_within(a, b, k)
            assert got == (true if true <= k else None), (a, b, k)


def test_lev_within_equal_length_insert_delete():
    # mism=3 but ED=2 — the equal-length hamming shortcut must NOT win
    assert lev_within("abc", "bcx", 2) == 2
    assert lev_within("abc", "bcx", 1) is None


def test_deletion_variants():
    assert deletion_variants("ab", 1) == {"ab", "a", "b"}
    assert deletion_variants("abc", 2) == {
        "abc", "ab", "ac", "bc", "a", "b", "c"}


def _brute_pairs(rows, k):
    out = set()
    for i, (ia, sa) in enumerate(rows):
        for ib, sb in rows[i + 1:]:
            d = _lev_full(sa, sb)
            if d <= k:
                out.add((min(ia, ib), max(ia, ib), d))
    return out


def _join_pairs(rows, k):
    ds = rd.from_arrow(pa.table({
        "id": pa.array([r[0] for r in rows], pa.int64()),
        "name": pa.array([r[1] for r in rows], pa.string())}))
    res = edit_distance_join(ds, key_col="name", id_col="id", k=k)
    return {(r["id_a"], r["id_b"], r["dist"]) for r in res.take_all()}


def test_join_brute_force_parity_k1_k2(ray_session):
    rng = random.Random(11)
    vocab = "abcde"
    rows = [(i, "".join(rng.choice(vocab) for _ in range(rng.randint(3, 7))))
            for i in range(120)]
    for k in (1, 2):
        assert _join_pairs(rows, k) == _brute_pairs(rows, k)


def test_join_duplicate_strings_and_empty(ray_session):
    # identical keys (dist 0) ARE emitted — exact duplicates are the
    # most important ER matches; near keys found once each
    rows = [(1, "anvil"), (2, "anvil"), (3, "anvik"), (4, "zzzz")]
    assert _join_pairs(rows, 1) == {(1, 2, 0), (1, 3, 1), (2, 3, 1)}
    empty = rd.from_arrow(pa.table({
        "id": pa.array([], pa.int64()),
        "name": pa.array([], pa.string())}))
    res = edit_distance_join(empty, key_col="name", id_col="id", k=1)
    assert res.count() == 0
    assert set(res.schema().names) == {"id_a", "id_b", "dist"}


def test_osa_metric_catches_transpositions(ray_session):
    import pandas as pd
    import ray.data

    from textgraphs_ray.stages.editjoin import edit_distance_join

    df = pd.DataFrame({"id": [1, 2, 3],
                       "k": ["name#01", "name#10", "other"]})
    ds = ray.data.from_pandas(df)
    lev = {(r["id_a"], r["id_b"]): r["dist"]
           for r in edit_distance_join(ds, key_col="k", id_col="id",
                                       k=1).take_all()}
    osa = {(r["id_a"], r["id_b"]): r["dist"]
           for r in edit_distance_join(ds, key_col="k", id_col="id",
                                       k=1, metric="osa").take_all()}
    assert (1, 2) not in lev        # transposition is Levenshtein 2
    assert osa == {(1, 2): 1}       # but OSA/Damerau 1


def test_osa_metric_k_guard(ray_session):
    import pandas as pd
    import pytest
    import ray.data

    from textgraphs_ray.stages.editjoin import edit_distance_join

    ds = ray.data.from_pandas(pd.DataFrame({"id": [1], "k": ["x"]}))
    with pytest.raises(ValueError):
        edit_distance_join(ds, key_col="k", id_col="id", k=2,
                           metric="osa")
