"""End-to-end LLM training-data curation: every major data-pipeline
family in this engine composed into ONE streaming chain over the
driver testdata documents table.

    quality + language gating          pipelines/curate.py
      + exact & near dedup (losers dropped distributed)
      → benchmark decontamination      stages/decontam.py
      → temperature mixture sampling   stages/sampling.py (α = 0.3)
      → leakage-safe train/val/test    stages/sampling.py hash_split
        (split hashed on the exact-dup keeper key, so duplicates
         never straddle the test fence)
      → greedy sequence packing        stages/pack.py (budget 4096)
      → deterministic shard routing    stages/pack.py shard_assign
      → resumable partitioned sink     sources/sinks.py

Every step is a Dataset transform — the chain stays lazy until the
sink consumes it, nothing materializes the corpus on the driver, and
every selection decision is an md5 variate (rerun/layout/cluster-size
invariant).  The same stages back the oracle-gated `curate*`,
`decontaminate`, `mixture_sample`, `split_assign`, `pack_greedy` and
`shard_stats` queries; this script is the composition demo.

Run: python examples/training_data_pipeline.py [sf_dir] [out_dir]
(owns its Ray session; defaults sf0.01 → /tmp/curated_out)
"""

from __future__ import annotations

import json
import os
import sys

import ray
import ray.data as rd

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from textgraphs_ray.pipelines.curate import curate_corpus      # noqa: E402
from textgraphs_ray.sources.sinks import (                     # noqa: E402
    write_partitioned_resumable)
from textgraphs_ray.stages.decontam import decontaminate       # noqa: E402
from textgraphs_ray.stages.pack import pack_greedy, shard_assign  # noqa: E402
from textgraphs_ray.stages.sampling import (hash_split,        # noqa: E402
                                            mixture_sample)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_out"

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet")

    # 1-2. quality/language gates + exact & near dedup (the dedup
    #    losers are dropped by a distributed anti-join — never on the
    #    driver in the "join" plan)
    cur = curate_corpus(docs, min_quality=0.30, langs=("en", "de"),
                        jaccard_threshold=0.7, loser_plan="join")
    curated, stats = cur["docs"], cur["stats"]

    # 3. decontamination against a held-out "benchmark": the last 25
    #    docs by id stand in for an eval set; any train row sharing a
    #    word 8-gram with them is flagged and dropped
    bench = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"])
             .sort("doc_id", descending=True).limit(25).materialize())
    flagged = decontaminate(curated, bench, n=8)
    clean = flagged.filter(expr="contaminated == 0")

    # 4. α = 0.3 temperature mixture: upweight small sources toward
    #    a 70%-of-corpus training budget
    mixed = mixture_sample(clean, alpha=0.3, target_frac=0.7)

    # 5. leakage-safe split: the curate stage already removed exact/
    #    near dup losers, so hashing the surviving doc_id is
    #    cluster-atomic by construction here (see `cluster_split` for
    #    the transitive-closure variant when losers are kept).
    #    IMPORTANT: salt the split key — mixture_sample already
    #    filtered on md5_frac(doc_id) < r_s ≤ 0.7, so reusing the raw
    #    id would make every survivor's variate < 0.7 and put the
    #    whole corpus in train (chained md5 selections must draw
    #    independent variates).
    import pyarrow as pa

    def salt(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.append_column(
            "split_key", pc.binary_join_element_wise(
                pc.cast(t.column("doc_id"), pa.string()), "#split",
                ""))

    split = hash_split(mixed.map_batches(salt, batch_format="pyarrow"),
                       splits={"train": 0.9, "val": 0.05,
                               "test": 0.05},
                       key_col="split_key")
    split = split.drop_columns(["split_key"])

    # 6-7. greedy packing into 4096-char bins per source, then
    #    deterministic shard routing for the training exporter
    packed = pack_greedy(split, budget=4096)
    sharded = shard_assign(packed, n_shards=8)

    # 8. resumable partitioned sink: one directory per shard with
    #    _SUCCESS markers — a rerun skips finished shards
    n_out = sharded.count()
    write_partitioned_resumable(sharded, out_dir,
                                partition_col="shard")

    split_census = {r["split"]: r["count()"] for r in
                    rd.read_parquet(out_dir)
                    .groupby("split").count().take_all()}
    print(json.dumps({
        "metric": "training_data_pipeline",
        "stages": stats,
        "rows_out": n_out,
        "splits": split_census,
        "out_dir": out_dir,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
