#!/usr/bin/env python
"""Cluster job entrypoint for the flagship ER pipeline — what runs
under ``ray job submit`` on a fixed-size multi-node cluster
(north_rule), and standalone on one node here:

    ray job submit --working-dir /root/repo -- \
        python scripts/run_er_job.py --input <parquet dir> \
            --output /data/clusters --checkpoints /data/ckpt

    python scripts/run_er_job.py --input /tmp/corpus --output /tmp/out

- reads the documents table (input_hint schema) from ``--input``;
- runs the checkpointed ER chain when ``--checkpoints`` is given
  (per-stage manifests + metrics.jsonl; a killed job resumes
  mid-pipeline) else the straight chain;
- writes clusters to ``--output`` via the RESUMABLE partitioned sink
  (one directory per cluster-id prefix, per-partition _SUCCESS
  markers — a rerun writes only missing partitions);
- prints one JSON line of throughput metrics.

Owns its Ray session (job entrypoints do): connects to the cluster
when launched via the job API (RAY_ADDRESS set by the runtime),
``address="local"`` otherwise.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import pyarrow as pa
import pyarrow.compute as pc

import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="documents parquet dir (input_hint schema)")
    ap.add_argument("--output", required=True,
                    help="clusters output dir (partitioned parquet)")
    ap.add_argument("--checkpoints", default=None,
                    help="checkpoint root for mid-stage resume")
    ap.add_argument("--assets", default=None,
                    help="optional media assets parquet")
    ap.add_argument("--num-partitions", type=int, default=8)
    ap.add_argument("--kinds", default="ent,media")
    args = ap.parse_args()

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False)
    import ray.data as rd
    rd.DataContext.get_current().enable_progress_bars = False

    from textgraphs_ray.sources.sinks import write_partitioned_resumable

    t0 = time.time()
    docs = rd.read_parquet(args.input)
    assets = None
    if args.assets:
        import pyarrow.parquet as pq
        assets = pq.read_table(args.assets)

    if args.checkpoints:
        from textgraphs_ray.pipelines.er_resume import \
            resolve_entities_checkpointed
        res = resolve_entities_checkpointed(
            docs, args.checkpoints, assets=assets,
            num_partitions=args.num_partitions)
        clusters = res["clusters"]
        resumed = res["resumed"]
    else:
        from textgraphs_ray.pipelines.er import resolve_entities
        res = resolve_entities(docs, assets=assets,
                               kinds=tuple(args.kinds.split(",")))
        clusters = res["clusters"] if isinstance(res, dict) else res
        resumed = {}

    # partition output on the cluster-id's first hex-ish char: bounded
    # partition count, balanced sizes, resumable per partition
    def add_part(t: pa.Table) -> pa.Table:
        part = pc.utf8_slice_codeunits(
            pc.cast(t.column("cluster_id"), pa.string()), 0, 1)
        return t.append_column("part", part)

    out = clusters.map_batches(add_part, batch_format="pyarrow")
    stats = write_partitioned_resumable(out, args.output, "part")
    wall = time.time() - t0
    n = stats["rows_written"]
    print(json.dumps({
        "metric": "er_job", "rows": n, "wall_sec": round(wall, 2),
        "rows_per_sec": round(n / wall, 1) if wall else None,
        "sink": stats, "resumed_stages": resumed,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
