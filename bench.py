#!/usr/bin/env python
"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, "docs_per_sec": ...}

``--scaling`` runs the headline ER pipeline twice in fresh processes
(num_cpus=8 and num_cpus=32) on the same input and reports both
throughputs plus the scaling efficiency (the sandbox stand-in for the
north rule's N vs 4N node comparison).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
ER_DOCS = int(os.environ.get("GRAFT_ER_DOCS", "20000"))
# extra filler spans per doc: 0 for the per-round bench (shuffle-heavy
# regime), ~60 for scaling runs (web-document-sized inputs where
# per-doc extraction compute dominates, as it does at 100 TB)
FILLER = int(os.environ.get("GRAFT_FILLER", "0"))
CORPUS_DIR = os.environ.get(
    "GRAFT_CORPUS_DIR", f"/tmp/graft_corpus_{ER_DOCS}_f{FILLER}")


def ensure_corpus() -> str:
    """Deterministic F5 corpus in the input_hint schema (built once,
    reused across bench invocations and both scaling levels).

    Shard count scales with corpus size: a generation worker holds one
    whole shard as Python span dicts before the Arrow conversion
    (~1.2 GB per 25k docs at 200 filler spans), so 32 fixed shards at
    3.2M docs put 32 × ~4 GB in flight and thrashed the host; capping
    a shard at 25k docs bounds pool-wide peak memory at ~38 GB
    regardless of corpus size."""
    marker = os.path.join(CORPUS_DIR, "truth.parquet")
    if not os.path.exists(marker):
        from textgraphs_ray.corpus import write_corpus

        shards = max(32, ER_DOCS // 25_000)
        write_corpus(CORPUS_DIR, ER_DOCS, shards=shards,
                     filler_spans=FILLER)
    return CORPUS_DIR


def main() -> None:
    import ray
    import ray.data as rd

    corpus_dir = ensure_corpus()

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = rd.DataContext.get_current()
    ctx.enable_progress_bars = False
    # The streaming executor's per-operator resource reservation
    # (ratio 0.5 split across every operator in the plan) caps the hot
    # stage of a 4-operator pipeline at a fraction of the session's
    # CPUs — measured via ds.stats(): the fused extract chain ran at
    # concurrency 3.3 of 8 CPUs with reservation on, 6.0 with it off
    # (extract wall 51.3s -> 29.7s, identical task time).  Our
    # pipelines are combiner-first (tiny inter-stage flows), so
    # starving upstream operators is not a risk; let the hot stage
    # take every idle slot.
    ctx.op_resource_reservation_enabled = False

    import pyarrow.parquet as pq

    from textgraphs_ray.pipelines.er import resolve_entities
    from textgraphs_ray.pipelines.gor import affinity_scores, load_ingram
    from textgraphs_ray.stages.dedup import exact_dedup, minhash_dedup
    from textgraphs_ray.stages.similarity import knn_brute
    from textgraphs_ray.stages.text import QualityScorer, TokenCounter

    queries: dict[str, float] = {}
    assets = pq.read_table(os.path.join(corpus_dir, "assets.parquet"))

    # Warm-up before the timed sections: `count()` on parquet only reads
    # footer metadata, so without this the first timed pipeline pays the
    # cold start of every Ray worker process (spawn + numpy/pandas/
    # pyarrow imports in 32 procs) — measured as the bulk of the 11–74 s
    # er_resolve spread between fresh sessions (BASELINE.md).  A tiny
    # map_batches across as many blocks as workers forces the pool up
    # and the heavy imports in, so the timed numbers are steady-state
    # throughput — the quantity that matters for the 100 TB claim.
    def _warm(batch):
        import pandas  # noqa: F401
        import numpy  # noqa: F401
        import pyarrow.compute  # noqa: F401

        from textgraphs_ray.stages import extract  # noqa: F401
        return batch

    (rd.range(NUM_CPUS * 4, override_num_blocks=NUM_CPUS * 4)
     .map_batches(_warm, batch_format="pyarrow").count())
    # and the page cache for the corpus files themselves
    for f in sorted(os.listdir(corpus_dir)):
        with open(os.path.join(corpus_dir, f), "rb") as fh:
            while fh.read(1 << 22):
                pass

    # headline: full ER chain on the interleaved corpus
    t0 = time.perf_counter()
    # pin block count to the cluster size: the sort-based shuffles fan
    # out (#blocks)² partition objects, so letting the read split into
    # hundreds of small blocks multiplies shuffle overhead without
    # adding parallelism
    docs_ds = rd.read_parquet(
        [os.path.join(corpus_dir, f) for f in sorted(os.listdir(corpus_dir))
         if f.startswith("documents-")],
        override_num_blocks=2 * NUM_CPUS)
    n_docs = docs_ds.count()
    res = resolve_entities(docs_ds, assets=assets,
                           num_partitions=max(8, NUM_CPUS // 2),
                           concurrency=(2, NUM_CPUS))
    n_clusters = res["clusters"].count()
    t_er = time.perf_counter() - t0
    queries["er_resolve"] = round(t_er, 3)

    # north-rule metric: pairwise F1 of predicted clusters vs generator
    # truth (evaluated outside the timed window — it's a check, not a
    # pipeline stage)
    import pyarrow as pa
    import pyarrow.compute as _pc

    truth_df = pq.read_table(
        os.path.join(corpus_dir, "truth.parquet")).to_pandas()
    ent_spans = res["spans"].map_batches(
        lambda t: t.filter(_pc.is_in(t.column("kind"),
                                     value_set=pa.array(["ent", "media"])))
        .select(["doc_id", "offset", "lemma_key"]),
        batch_format="pyarrow").to_pandas()
    from textgraphs_ray.evaluate import er_f1_against_truth

    er_prec, er_rec, er_f1 = er_f1_against_truth(
        ent_spans, res["clusters"].to_pandas(), truth_df)

    # release the ER chain's materialized datasets before the secondary
    # pipelines: the spans/mentions/clusters blocks otherwise stay
    # pinned in the object store for the rest of the run and push the
    # later dedup shuffles into spill territory
    del res, ent_spans, truth_df, docs_ds
    import gc

    gc.collect()

    # secondary pipelines over driver testdata (skipped for --scaling
    # legs, which compare only the headline ER chain)
    if os.environ.get("GRAFT_BENCH_ONLY") == "er":
        print(json.dumps({
            "metric": "graft_bench_total",
            "value": queries["er_resolve"],
            "unit": "sec",
            "queries": queries,
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
            "er_docs": n_docs,
            "er_clusters": n_clusters,
            "er_f1": round(er_f1, 5),
            "er_precision": round(er_prec, 5),
            "er_recall": round(er_rec, 5),
            "docs_per_sec": round(n_docs / t_er, 1),
        }))
        ray.shutdown()
        return

    t0 = time.perf_counter()
    docs = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"])
    (docs.map_batches(TokenCounter, batch_format="pyarrow",
                      concurrency=max(2, NUM_CPUS // 4))
     .map_batches(QualityScorer, batch_format="pyarrow",
                  concurrency=max(2, NUM_CPUS // 4))
     .count())
    queries["text_analysis"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    exact_dedup(rd.read_parquet(f"{SF_DIR}/documents.parquet",
                                columns=["doc_id", "text"])).count()
    queries["dedup_exact"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    minhash_dedup(rd.read_parquet(f"{SF_DIR}/documents.parquet",
                                  columns=["doc_id", "text"]),
                  concurrency=max(2, NUM_CPUS // 4)).count()
    queries["dedup_minhash"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    import numpy as np

    emb = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    qmat = np.stack(emb.to_pandas().sort_values("vec_id").head(8)
                    ["embedding"].to_numpy())
    knn_brute(rd.read_parquet(f"{SF_DIR}/embeddings.parquet",
                              columns=["vec_id", "embedding"]), qmat, k=10)
    queries["knn_brute"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    edges, rels, _ = load_ingram("/root/reference/examples/ingram.json")
    affinity_scores(rd.from_arrow(edges), rels)
    queries["gor_affinity"] = round(time.perf_counter() - t0, 3)

    # heavy operator-tail families (round 5): the 200-query tail had a
    # correctness signal but no perf-regression signal — time the three
    # most expensive representatives at sf0.1 through the exact same
    # entry the driver gate calls
    import __ray_entry__ as _entry

    _tail = _entry._all_queries()
    for name in ("similarity_join", "meta_blocking_ecbs", "bpe_learn"):
        t0 = time.perf_counter()
        out = _tail[name](SF_DIR)
        if hasattr(out, "count"):   # Dataset: consume the stream
            out.count()
        queries[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(queries.values()), 3)
    print(json.dumps({
        "metric": "graft_bench_total",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "er_docs": n_docs,
        "er_clusters": n_clusters,
        "er_f1": round(er_f1, 5),
        "er_precision": round(er_prec, 5),
        "er_recall": round(er_rec, 5),
        "docs_per_sec": round(n_docs / t_er, 1),
    }))
    ray.shutdown()


def _hw_throughput(nproc: int, n_iter: int = 20_000_000) -> float:
    """Aggregate pure-Python busy-loop throughput across ``nproc``
    forked processes (M iter/s).

    This sandbox is a Firecracker microVM whose 32 vCPUs are backed by
    a drifting, oversubscribed physical host: a plain multiprocessing
    busy loop measured 8 -> 32 procs at only 2.2x aggregate (hardware
    scaling ceiling 0.56) on a busy afternoon, while the same test has
    hit ~0.9+ on quiet mornings.  No Ray configuration can exceed what
    the hypervisor physically delivers, so ``--scaling`` measures this
    ceiling at the same moment as each Ray leg and reports the Ray
    job's efficiency both raw and normalized by it.
    """
    import multiprocessing as mp

    with mp.Pool(nproc) as pool:
        t0 = time.perf_counter()
        pool.map(_burn, [n_iter] * nproc)
        dt = time.perf_counter() - t0
    return nproc * n_iter / dt / 1e6


def _burn(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def scaling() -> None:
    # Scaling verdicts need a compute-dominated job: the corpus
    # vocabulary is bounded, so every stage AFTER mention-distinct
    # (blocking, scoring, closure) is near-constant cost (~7 s of
    # small shuffles) regardless of doc count — a fixed term that
    # flattens the curve unless extraction dominates.  Stage-level
    # profile at 800k docs: extract+mentions ~14-36 s, pairs+score
    # ~3 s, closure ~3 s.  3.2M web-document-sized docs (200 filler
    # spans each) push the parallel fraction past 90% at 32 CPUs and
    # make each leg minutes long, which also averages over the
    # host's minute-scale speed drift.
    scaling_docs = os.environ.get("GRAFT_SCALING_DOCS", "3200000")
    scaling_filler = os.environ.get("GRAFT_SCALING_FILLER", "200")
    # The sandbox host's wall-clock speed drifts up to ~3x between
    # fresh processes minutes apart (BASELINE.md) — a single lo/hi
    # pair can land in different noise regimes and report any ratio.
    # Run the legs INTERLEAVED (lo,hi,lo,hi,...) and take the per-leg
    # MIN: under additive/multiplicative slowdown noise the min
    # converges on the quiet-host time for each leg.
    reps = int(os.environ.get("GRAFT_SCALING_REPS", "3"))

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_ER_DOCS=scaling_docs,
                   GRAFT_FILLER=scaling_filler,
                   GRAFT_BENCH_ONLY="er")
        env.pop("GRAFT_CORPUS_DIR", None)
        out = subprocess.run([sys.executable, __file__], env=env,
                             capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo = int(os.environ.get("GRAFT_SCALING_LO", "8"))
    hi = int(os.environ.get("GRAFT_SCALING_HI", "32"))
    runs_lo, runs_hi = [], []
    hw_lo, hw_hi = [], []
    for _ in range(reps):
        # hardware calibration brackets each Ray leg so the ceiling is
        # measured under the same host conditions as the job itself
        hw_lo.append(_hw_throughput(lo))
        runs_lo.append(run(lo))
        hw_hi.append(_hw_throughput(hi))
        runs_hi.append(run(hi))
    # close the bracket: one final probe pair after the last legs
    hw_lo.append(_hw_throughput(lo))
    hw_hi.append(_hw_throughput(hi))
    t_lo = min(r["queries"]["er_resolve"] for r in runs_lo)
    t_hi = min(r["queries"]["er_resolve"] for r in runs_hi)
    best_lo = min(runs_lo, key=lambda r: r["queries"]["er_resolve"])
    best_hi = min(runs_hi, key=lambda r: r["queries"]["er_resolve"])
    eff = (t_lo / t_hi) / (hi / lo)
    # what the hypervisor physically delivered for hi vs lo procs: the
    # upper bound on ANY job's raw scaling efficiency at this moment
    hw_ceiling = (max(hw_hi) / max(hw_lo)) / (hi / lo)
    norm_eff = min(1.0, eff / hw_ceiling) if hw_ceiling > 0 else eff
    print(json.dumps({
        "metric": "scaling_efficiency",
        "value": round(norm_eff, 3),
        "unit": "ratio",
        "raw_efficiency": round(eff, 3),
        "hw_ceiling": round(hw_ceiling, 3),
        "hw_miter_lo": [round(x, 1) for x in hw_lo],
        "hw_miter_hi": [round(x, 1) for x in hw_hi],
        "num_cpus_lo": lo, "num_cpus_hi": hi,
        "er_sec_lo": t_lo, "er_sec_hi": t_hi,
        "reps": reps,
        "er_sec_lo_runs": [r["queries"]["er_resolve"] for r in runs_lo],
        "er_sec_hi_runs": [r["queries"]["er_resolve"] for r in runs_hi],
        "docs_per_sec_lo": best_lo["docs_per_sec"],
        "docs_per_sec_hi": best_hi["docs_per_sec"],
        "er_f1_lo": best_lo["er_f1"], "er_f1_hi": best_hi["er_f1"],
        "er_clusters_lo": best_lo["er_clusters"],
        "er_clusters_hi": best_hi["er_clusters"],
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
