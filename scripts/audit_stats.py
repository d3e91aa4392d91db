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


def show(label: str, ds, dt: float) -> None:
    print(f"\n== {label}: {dt:.2f}s wall ==")
    rows = op_summary(ds.stats())
    if rows:
        width = max(len(r[0]) for r in rows)
        for name, wall in rows:
            print(f"  {name:<{width}}  {wall}")


def main() -> None:
    """Phase-by-phase timing: resolve_entities materializes mentions and
    matches internally, so the final clusters.stats() lineage only covers
    the closure loop.  Re-run the same phases here with explicit timers
    (same code paths, same defaults as resolve_entities)."""
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    from textgraphs_ray.corpus import generate
    from textgraphs_ray.pipelines.er import (
        extract_spans, mentions_from_spans)
    from textgraphs_ray.stages.blocking import candidate_pairs
    from textgraphs_ray.stages.cluster import propagate_labels
    from textgraphs_ray.stages.scoring import score_pairs

    docs, _, assets = generate(n_docs)
    # from_arrow yields ONE block → one task per stage; match bench.py's
    # read shape (override_num_blocks=2×CPUs) or every stat is serial.
    ds = rd.from_arrow(docs).repartition(64)
    t0 = time.time()
    spans = extract_spans(ds)
    assets_ref = ray.put(assets) if assets is not None else None
    t = time.time()
    mentions = mentions_from_spans(spans, assets_ref).materialize()
    show("extract + mentions", mentions, time.time() - t)
    t = time.time()
    pairs = candidate_pairs(mentions)
    matches = score_pairs(pairs).materialize()
    show("block + score", matches, time.time() - t)
    t = time.time()
    clusters = propagate_labels(mentions, matches,
                                num_partitions=16).materialize()
    show("closure", clusters, time.time() - t)
    print(f"\nn_docs={n_docs} clusters={clusters.count()} "
          f"total={time.time() - t0:.2f}s")
    ray.shutdown()


if __name__ == "__main__":
    main()
