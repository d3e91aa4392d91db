#!/usr/bin/env python
"""Pathological-block skew stress for the ER blocking stage.

VERDICT r04 task 6: the salting machinery (block caps + window
pairing, ``stages/blocking.py``; salted aggregates,
``functions/salted.py``) existed but no recorded run exercised a
pathologically hot block.  This script builds one deliberately:

- a full-pool corpus (pool = 2 500 entities over 74 surnames, so each
  surname's last-token block holds ~34 entities × ~5 surface variants
  ≈ 170 distinct keys — 5×+ over ``BLOCK_CAP=32``), plus
- an injected hot-surname wave: every entity sharing the most common
  surname gets extra mention docs with fresh typo variants, pushing
  one last-token block to ≥ 1% of ALL distinct mentions.

It then reports (1) the block-size census at the blocking shuffle —
max block, blocks over the cap, hot-block mention share, the pair-
emission saving vs uncapped C(g,2) pairing — and (2) pairwise
F1/precision/recall of the full resolve chain vs generator truth (the
north-rule invariant: the cap must not cost recall, because window
pairing keeps each block CONNECTED and closure is transitive).

Usage::

    python scripts/skew_stress.py [n_docs] [hot_docs]   # 25000 2000

Prints one JSON line; the result is recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import random
import sys

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    ctx = rd.DataContext.get_current()
    ctx.enable_progress_bars = False

    from textgraphs_ray.corpus import generate, variant_of
    from textgraphs_ray.evaluate import er_f1_against_truth
    from textgraphs_ray.pipelines.er import (mentions_from_spans,
                                             resolve_entities)
    from textgraphs_ray.stages.blocking import (BLOCK_CAP,
                                                NEIGHBOR_WINDOW,
                                                BandEmitter)

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000
    hot_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    docs, truth, assets = generate(n_docs)

    # ---- inject the hot-surname wave ------------------------------
    # the pool is deterministic per seed, so the entity list (and each
    # entity_id = pool index) is recoverable without touching corpus.py
    from textgraphs_ray.corpus import canonical_entities

    pool = canonical_entities(max(2, n_docs // 10), random.Random(42))
    surname: dict[str, list] = {}
    for eid, name in enumerate(pool):
        last = name.rsplit(" ", 1)[-1]
        surname.setdefault(last, []).append((eid, name))
    hot_last, hot_members = max(surname.items(),
                                key=lambda kv: len(kv[1]))
    rng = random.Random(20250820)
    rows_docs, rows_truth = [], []
    for i in range(hot_docs):
        eid, name = hot_members[i % len(hot_members)]
        surf = variant_of(name, rng)
        did = f"hot-{i:06d}"
        rows_docs.append({
            "doc_id": did,
            "spans": [{"kind": "ent", "text": surf,
                       "media_ref": "", "offset": 0}]})
        rows_truth.append({"doc_id": did, "offset": 0,
                           "entity_id": eid, "surface": surf})
    hot_tbl = pa.Table.from_pylist(rows_docs, schema=docs.schema)
    docs = pa.concat_tables([docs, hot_tbl])
    truth = pa.concat_tables([
        truth, pa.Table.from_pylist(rows_truth, schema=truth.schema)])

    docs_ds = rd.from_arrow(docs).repartition(64).materialize()

    # ---- block census at the blocking shuffle ---------------------
    from textgraphs_ray.pipelines.er import extract_spans

    spans_ds = extract_spans(docs_ds)
    mentions = mentions_from_spans(
        spans_ds, ray.put(assets), kinds=("ent", "media")).materialize()
    n_mentions = mentions.count()
    banded = mentions.map_batches(BandEmitter(), batch_format="pyarrow")

    def block_sizes(t: pa.Table) -> pa.Table:
        import pandas as pd
        df = pd.DataFrame({
            "band_id": t.column("band_id").to_numpy(
                zero_copy_only=False),
            "band_hash": t.column("band_hash").to_numpy(
                zero_copy_only=False)})
        g = (df.groupby(["band_id", "band_hash"], sort=False)
             .size().reset_index(name="n"))
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    census = (banded.map_batches(block_sizes, batch_format="pyarrow")
              .groupby(["band_id", "band_hash"])
              .aggregate(Sum("n", alias_name="n")))
    sizes = np.array([r["n"] for r in census.take_all()], np.int64)
    over = sizes[sizes > BLOCK_CAP]
    pairs_capped = int(
        (sizes[sizes <= BLOCK_CAP] * (sizes[sizes <= BLOCK_CAP] - 1)
         // 2).sum()
        + sum(int(g * NEIGHBOR_WINDOW - NEIGHBOR_WINDOW
                  * (NEIGHBOR_WINDOW + 1) // 2) for g in over))
    pairs_uncapped = int((sizes * (sizes - 1) // 2).sum())

    # ---- full resolve + F1 ----------------------------------------
    res = resolve_entities(docs_ds, assets=assets)
    import pyarrow.compute as pc

    ent_spans = res["spans"].map_batches(
        lambda t: t.filter(pc.is_in(
            t.column("kind"), value_set=pa.array(["ent", "media"])))
        .select(["doc_id", "offset", "lemma_key"]),
        batch_format="pyarrow").to_pandas()
    prec, rec, f1 = er_f1_against_truth(
        ent_spans, res["clusters"].to_pandas(), truth.to_pandas())

    print(json.dumps({
        "metric": "skew_stress",
        "n_docs": int(docs_ds.count()),
        "hot_surname": hot_last,
        "hot_entities": len(hot_members),
        "n_mentions_distinct": int(n_mentions),
        "n_blocks": int(len(sizes)),
        "max_block": int(sizes.max()),
        "blocks_over_cap": int(len(over)),
        "block_cap": int(BLOCK_CAP),
        "hot_block_mention_share": round(
            float(sizes.max()) / float(n_mentions), 4),
        "pairs_capped": pairs_capped,
        "pairs_uncapped_wouldbe": pairs_uncapped,
        "pair_saving_x": round(pairs_uncapped / max(pairs_capped, 1), 2),
        "er_precision": round(prec, 5),
        "er_recall": round(rec, 5),
        "er_f1": round(f1, 5),
        "clusters": int(res["clusters"].count()),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
