"""Jaro-Winkler distinct-value theta-join vs DuckDB's
jaro_winkler_similarity (stages/editjoin.py jw_distinct_join)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data

from textgraphs_ray.stages.editjoin import jw_distinct_join

NAMES = ["small ring", "small bolt", "smal ring", "small rings",
         "red widget", "red widgets", "blue bolt", "blue bolts",
         "martha stewart", "marhta stewart", "unique zebra"]


def _ds(names):
    return ray.data.from_pandas(pd.DataFrame({"p_name": names}))


@pytest.mark.parametrize("threshold", [0.88, 0.95])
def test_jw_join_matches_duckdb(threshold):
    # duplicate rows on purpose: the join is over DISTINCT values
    got = {(r["name_a"], r["name_b"]): r["jw"]
           for r in jw_distinct_join(_ds(NAMES + NAMES), col="p_name",
                                     threshold=threshold).take_all()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?) AS nm", [NAMES])
    want = {(a, b): j for a, b, j in con.execute(f"""
        WITH dn AS (SELECT DISTINCT nm FROM t)
        SELECT a.nm, b.nm, round(jaro_winkler_similarity(a.nm, b.nm), 6)
        FROM dn a JOIN dn b ON a.nm < b.nm
        WHERE round(jaro_winkler_similarity(a.nm, b.nm), 6)
              >= {threshold}""").fetchall()}
    assert got == want


def test_jw_join_max_distinct_guard():
    with pytest.raises(ValueError):
        jw_distinct_join(_ds(NAMES), col="p_name", max_distinct=3)


def test_monge_elkan_matches_duckdb():
    from textgraphs_ray.stages.editjoin import monge_elkan_join

    names = ["red widget", "widget red", "red widgit", "blue bolt",
             "bolt blue", "small ring", "smal ring", "green lace"]
    got = {(r["name_a"], r["name_b"]): r["me"]
           for r in monge_elkan_join(_ds(names), col="p_name",
                                     threshold=0.7).take_all()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?) AS nm", [names])
    want = {(a, b): m for a, b, m in con.execute("""
        WITH dn AS (SELECT DISTINCT nm FROM t),
        pr AS (SELECT a.nm AS a, b.nm AS b
               FROM dn a JOIN dn b ON a.nm < b.nm),
        wa AS (SELECT a, b, string_split(a, ' ') AS w FROM pr),
        wb AS (SELECT a, b, string_split(b, ' ') AS w FROM pr),
        ta AS (SELECT a, b, w[i] AS tok, i
               FROM wa, LATERAL unnest(range(1, len(w) + 1)) AS t(i)),
        tb AS (SELECT a, b, w[i] AS tok, i
               FROM wb, LATERAL unnest(range(1, len(w) + 1)) AS t(i)),
        ba AS (SELECT ta.a, ta.b, ta.i,
                      max(jaro_winkler_similarity(ta.tok, tb.tok)) AS m
               FROM ta JOIN tb ON ta.a = tb.a AND ta.b = tb.b
               GROUP BY ta.a, ta.b, ta.i),
        meab AS (SELECT a, b, avg(m) AS me_ab FROM ba GROUP BY a, b),
        bb AS (SELECT tb.a, tb.b, tb.i,
                      max(jaro_winkler_similarity(tb.tok, ta.tok)) AS m
               FROM tb JOIN ta ON ta.a = tb.a AND ta.b = tb.b
               GROUP BY tb.a, tb.b, tb.i),
        meba AS (SELECT a, b, avg(m) AS me_ba FROM bb GROUP BY a, b)
        SELECT meab.a, meab.b, round((me_ab + me_ba) / 2, 6)
        FROM meab JOIN meba USING (a, b)
        WHERE round((me_ab + me_ba) / 2, 6) >= 0.7""").fetchall()}
    assert got == want
    # word-order swaps are ME-identical matches
    assert got[("red widget", "widget red")] == 1.0


def test_jw_boost_threshold_matches_duckdb_everywhere():
    from textgraphs_ray.functions.strsim import jaro_winkler_batch

    con = duckdb.connect()
    import numpy as np
    pairs = [(a, b) for a in NAMES for b in NAMES]
    ours = jaro_winkler_batch(
        np.array([p[0] for p in pairs], object),
        np.array([p[1] for p in pairs], object), boost_threshold=0.7)
    for (a, b), o in zip(pairs, ours):
        t = con.execute("SELECT jaro_winkler_similarity(?, ?)",
                        [a, b]).fetchone()[0]
        assert abs(o - t) < 1e-12, (a, b, o, t)
