#!/usr/bin/env python
"""End-to-end training-corpus preparation on the Ray engine — the
LLM-data-pipeline operators chained the way a pretraining run uses
them:

    quality/language filter ──► exact + MinHash dedup (curate)
        ──► repeated-substring removal ──► benchmark decontamination
        ──► leakage-safe train/val split ──► weighted source interleave
        ──► greedy sequence packing ──► shard routing
        ──► partitioned parquet

Run: ``python examples/prepare_corpus.py [sf_dir] [out_dir]``
(defaults: /root/testdata/sf0.001, /tmp/prepared_corpus).  Owns its
Ray session; every stage streams — the only driver-side sets are the
dup-loser / benchmark-gram broadcasts, each dup-rate- or
eval-set-bounded.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import pyarrow as pa
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/prepared_corpus"

    from textgraphs_ray.pipelines.curate import curate_corpus
    from textgraphs_ray.stages.decontam import decontaminate
    from textgraphs_ray.stages.dedup import substring_dedup
    from textgraphs_ray.stages.pack import (interleave_sources, pack_greedy,
                                            shard_assign)

    t0 = time.perf_counter()
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "source"])

    # 1. curation chain: quality → language → exact dedup → near dedup
    res = curate_corpus(docs, min_quality=0.0, langs=("en", "und"),
                        jaccard_threshold=0.7)
    print("curate stats:", res["stats"])
    kept = res["docs"].select_columns(["doc_id", "text", "source"])

    # 2. strip corpus-wide repeated substrings (ExactSubstr semantics),
    #    then re-shape back to (doc_id, text, source): the curated
    #    id→source map is small (post-dedup survivors), broadcast once
    stripped = substring_dedup(kept, window=10)
    src_map = {r["doc_id"]: r["source"]
               for r in kept.select_columns(["doc_id", "source"])
               .iter_rows()}
    src_ref = ray.put(src_map)

    def reshape(batch: pa.Table) -> pa.Table:
        m = ray.get(src_ref)
        ids = batch.column("doc_id").to_pylist()
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "text": batch.column("text_dedup"),
            "source": pa.array([m.get(d) for d in ids], pa.string()),
        })

    stripped = stripped.map_batches(reshape, batch_format="pyarrow")

    # 3. decontaminate against the held-out benchmark source (src0)
    bench = docs.filter(expr="source == 'src0'")
    clean = (decontaminate(stripped, bench, n=8)
             .filter(expr="contaminated == 0"))

    # 4. deterministic train/val split.  Hashing doc_id is
    #    leakage-safe HERE because curate() already removed exact and
    #    near duplicates upstream; if dedup were skipped or loosened,
    #    pass the dup-cluster keeper as key_col instead (the
    #    split_assign query shows that composition)
    from textgraphs_ray.stages.sampling import hash_split

    split = hash_split(clean, splits={"train": 0.9, "val": 0.1},
                       key_col="doc_id")
    train = split.filter(expr="split == 'train'")

    # 5. 3:1 mixture of two sources, deterministic interleave order
    mixed = interleave_sources(train, weights={"src1": 3, "src2": 1},
                               stop="all_exhausted")

    # 6. token-budget packing and shard routing, then partitioned write
    def add_len(t: pa.Table) -> pa.Table:
        n = [len((x or "").split()) for x in t.column("text").to_pylist()]
        return t.append_column("n_tokens", pa.array(n, pa.int64()))

    packed = pack_greedy(mixed.map_batches(add_len, batch_format="pyarrow"),
                         budget=512, group_col="source",
                         len_col="n_tokens")
    sharded = shard_assign(packed, n_shards=4)
    sharded.write_parquet(out_dir, partition_cols=["shard"])

    n = rd.read_parquet(out_dir).count()
    print(f"prepared {n} rows -> {out_dir} "
          f"in {time.perf_counter() - t0:.1f}s")
    ray.shutdown()


if __name__ == "__main__":
    main()
