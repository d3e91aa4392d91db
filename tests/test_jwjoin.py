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
