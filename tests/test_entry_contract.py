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


def test_fim_split_ascii_gather_matches_python_semantics(ray_session):
    """The zero-copy byte-gather fast path must emit exactly the
    Python char-semantics output on ASCII, and non-ASCII batches must
    take the fallback (byte != char positions there)."""
    import pyarrow as pa
    import ray.data as rd

    m = _entry()
    texts = ["", "a", "ab", "abc", "abcd", "hello world " * 7,
             "x" * 23, "y" * 24, "tail"]
    docs = pa.table({"doc_id": pa.array(range(len(texts)),
                                        pa.int64()),
                     "text": pa.array(texts, pa.string())})

    def python_fim(s):
        n = len(s)
        c1, c2 = n // 3, (2 * n) // 3
        return ("<PRE>" + s[:c1] + "<SUF>" + s[c2:]
                + "<MID>" + s[c1:c2])

    import tempfile, os
    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as td:
        pq.write_table(
            pa.table({"doc_id": docs.column("doc_id"),
                      "text": docs.column("text"),
                      "lang": pa.array(["en"] * len(texts)),
                      "source": pa.array(["s"] * len(texts)),
                      "n_chars": pa.array(
                          [len(t) for t in texts], pa.int64())}),
            os.path.join(td, "documents.parquet"))
        got = {r["doc_id"]: r["fim"]
               for r in m._all_queries()["fim_split"](td).take_all()}
    assert got == {i: python_fim(t) for i, t in enumerate(texts)}

    # non-ASCII: multi-byte codepoints must split on CHAR thirds
    nas = ["héllo wörld", "ünï", "日本語のテキストです"]
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(
            pa.table({"doc_id": pa.array(range(len(nas)), pa.int64()),
                      "text": pa.array(nas, pa.string()),
                      "lang": pa.array(["xx"] * len(nas)),
                      "source": pa.array(["s"] * len(nas)),
                      "n_chars": pa.array([len(t) for t in nas],
                                          pa.int64())}),
            os.path.join(td, "documents.parquet"))
        got = {r["doc_id"]: r["fim"]
               for r in m._all_queries()["fim_split"](td).take_all()}
    assert got == {i: python_fim(t) for i, t in enumerate(nas)}
