#!/usr/bin/env python
"""Per-operator wall-time audit of the flagship ER chain via Ray Data's
own execution stats (`ds.stats()`) — the measure-don't-guess loop.

Usage:  python scripts/audit_stats.py [n_docs]   (default 5000)

Prints each stage's Ray operator summary (wall time, block counts,
per-node throughput) plus a compact stage table, so a perf regression
shows up as a specific operator, not a vague total.
"""

from __future__ import annotations

import re
import sys
import time

import ray

if not ray.is_initialized():
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")

import ray.data as rd  # noqa: E402

rd.DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, "/root/repo")


def op_summary(stats: str) -> list[tuple[str, str]]:
    """Extract (operator, wall-time range) lines from ds.stats()."""
    out = []
    for m in re.finditer(
            r"Operator (\d+) (\S+?):.*?\n.*?Remote wall time: ([^\n]+)",
            stats):
        out.append((f"op{m.group(1)} {m.group(2)}", m.group(3)))
    return out


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    from textgraphs_ray.corpus import generate
    from textgraphs_ray.pipelines.er import resolve_entities

    docs, _, assets = generate(n_docs)
    ds = rd.from_arrow(docs)
    t0 = time.time()
    res = resolve_entities(ds, assets=assets)
    clusters = res["clusters"] if isinstance(res, dict) else res
    clusters = clusters.materialize()
    total = time.time() - t0
    print(f"n_docs={n_docs} clusters={clusters.count()} "
          f"total={total:.2f}s")
    stats = clusters.stats()
    rows = op_summary(stats)
    if rows:
        width = max(len(r[0]) for r in rows)
        for name, wall in rows:
            print(f"  {name:<{width}}  {wall}")
    else:  # fall back to the raw stats text
        print(stats)
    ray.shutdown()


if __name__ == "__main__":
    main()
