#!/usr/bin/env python
"""Warm intra-session A/B of dedup_minhash: round-1 code vs HEAD.

Host wall-clock is ~3x noisy BETWEEN fresh processes (BASELINE.md), so
the repo's measurement doctrine for perf claims is a warm min-of-N A/B
inside ONE Ray session: import the old implementation from a git
worktree, the new one from the repo, alternate runs A/B/A/B... on the
same input, and compare the minima.  Module-purging between runs keeps
cloudpickle shipping the right code to the workers.

Usage: python scripts/ab_minhash.py /tmp/r1wt [reps]
Prints one JSON line {"old_min": s, "new_min": s, "old": [...], ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def purge(path_old: str, path_new: str, want: str) -> None:
    for mod in list(sys.modules):
        if mod.startswith("textgraphs_ray"):
            del sys.modules[mod]
    for p in (path_old, path_new):
        while p in sys.path:
            sys.path.remove(p)
    sys.path.insert(0, want)


def run_once() -> tuple[float, int]:
    import ray.data as rd

    from textgraphs_ray.stages.dedup import minhash_dedup

    t0 = time.perf_counter()
    n = minhash_dedup(
        rd.read_parquet(f"{SF_DIR}/documents.parquet",
                        columns=["doc_id", "text"]),
        concurrency=max(2, NUM_CPUS // 4)).count()
    return time.perf_counter() - t0, n


def main() -> None:
    old_path = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    new_path = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, logging_level="ERROR")
    ctx = rd.DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.op_resource_reservation_enabled = False

    old_times, new_times = [], []
    old_n = new_n = None
    # one unrecorded warmup each (object-store / import warm)
    for label, path, times in [("old", old_path, None),
                               ("new", new_path, None)]:
        purge(old_path, new_path, path)
        run_once()
    for i in range(reps):
        purge(old_path, new_path, old_path)
        dt, old_n = run_once()
        old_times.append(round(dt, 3))
        purge(old_path, new_path, new_path)
        dt, new_n = run_once()
        new_times.append(round(dt, 3))
        print(f"rep {i}: old={old_times[-1]} new={new_times[-1]}",
              file=sys.stderr)
    assert old_n == new_n, f"cluster counts differ: {old_n} vs {new_n}"
    print(json.dumps({
        "pipeline": "dedup_minhash", "sf": SF_DIR, "num_cpus": NUM_CPUS,
        "rows": old_n,
        "old_commit": "77fd277", "old": old_times, "new": new_times,
        "old_min": min(old_times), "new_min": min(new_times),
        "speedup_min": round(min(old_times) / min(new_times), 3),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
