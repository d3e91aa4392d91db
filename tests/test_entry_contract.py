"""Driver-contract consistency: queries()/oracle_sql() stay aligned.

The driver imports ``__ray_entry__`` and calls these surfaces blind —
key mismatches or non-callables fail silently as missing coverage, so
pin the invariants here.
"""

from __future__ import annotations

import sys


def _entry():
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as m
    return m


def test_oracle_keys_subset_of_queries():
    m = _entry()
    qs = m.queries()
    oracles = m.oracle_sql()
    assert set(oracles) <= set(qs), sorted(set(oracles) - set(qs))
    # every query is a callable of one positional arg (sf_dir)
    import inspect

    for name, fn in qs.items():
        assert callable(fn), name
        params = [p for p in inspect.signature(fn).parameters.values()
                  if p.default is inspect.Parameter.empty
                  and p.kind in (p.POSITIONAL_ONLY,
                                 p.POSITIONAL_OR_KEYWORD)]
        assert len(params) == 1, (name, params)


def test_oracle_sql_parses():
    """Every oracle statement must at least PREPARE against the table
    schemas (catches SQL typos without running the full gate)."""
    import duckdb
    import pytest

    m = _entry()
    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    for name, sql in m.oracle_sql().items():
        try:
            con.execute(f"SELECT * FROM ({sql}) LIMIT 0")
        except Exception as e:  # noqa: BLE001
            pytest.fail(f"oracle_sql[{name!r}] does not parse: {e}")
