#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every queries()
entry at sf0.01 and compare against oracle_sql() via DuckDB (row count,
schema names, order-insensitive value hash)."""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

import ray
import ray.data as rd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
# optional 2nd arg: comma-separated query names to check (default: all)
ONLY = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        "\x1f".join(repr(v) for v in row) for row in df.itertuples(index=False))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> None:
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if ONLY is not None and name not in ONLY:
            continue
        try:
            got = to_pandas(fn(SF))
        except Exception as e:  # noqa: BLE001
            print(f"{name:18s} ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"{name:18s} rows-only: {len(got)} rows, "
                  f"cols={sorted(got.columns)}")
            continue
        exp = con.execute(oracles[name]).df()
        ok_rows = len(got) == len(exp)
        ok_schema = sorted(got.columns) == sorted(exp.columns)
        # normalize dtypes: DuckDB may give different int widths
        g = got.copy()
        e = exp.copy()
        for c in sorted(set(g.columns) & set(e.columns)):
            if pd.api.types.is_numeric_dtype(g[c]) and \
                    pd.api.types.is_numeric_dtype(e[c]):
                g[c] = g[c].astype("float64").round(6)
                e[c] = e[c].astype("float64").round(6)
            else:
                g[c] = g[c].astype(str)
                e[c] = e[c].astype(str)
        ok_hash = ok_schema and value_hash(g) == value_hash(e)
        status = "OK" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{name:18s} {status} rows={len(got)}/{len(exp)} "
              f"schema={'=' if ok_schema else sorted(got.columns)}"
              f"{'' if ok_schema else sorted(exp.columns)} hash_ok={ok_hash}")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
