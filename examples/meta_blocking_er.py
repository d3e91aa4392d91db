#!/usr/bin/env python
"""Meta-blocking walkthrough — how the comparison budget shrinks
through the Papadakis block-processing chain (stages/metablock.py):

    shingle token blocks ──► block purging ──► block filtering
        ──► CBS blocking graph ──► WEP / WNP / CNP / ECBS pruning

Each step prints the surviving comparison count, the quantity a
pairwise ER scorer would actually pay for.  Run:

    python examples/meta_blocking_er.py [sf_dir]

(owns its Ray session; default input /root/testdata/sf0.01)."""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main() -> None:
    import ray
    import ray.data as rd

    from textgraphs_ray.stages.metablock import (block_filtering,
                                                 blocking_graph,
                                                 ecbs_edges, prune_cnp,
                                                 prune_wep, prune_wnp,
                                                 shingle_blocks)

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    blocks = shingle_blocks(docs, shingle=3).materialize()
    print(f"block assignments            {blocks.count():>10}")

    raw = blocking_graph(blocks).materialize()
    print(f"edges, no purging            {raw.count():>10}")

    purged = blocking_graph(blocks, max_block_size=15).materialize()
    print(f"edges after block purging    {purged.count():>10}")

    filtered = block_filtering(blocks, ratio=0.75).materialize()
    filt_edges = blocking_graph(filtered,
                                max_block_size=15).materialize()
    print(f"edges after block filtering  {filt_edges.count():>10}")

    for name, pruned in (("WEP (global mean)", prune_wep(purged)),
                         ("WNP (node means)", prune_wnp(purged)),
                         ("CNP (top-10/node)", prune_cnp(purged, k=10))):
        print(f"edges after {name:<17}{pruned.count():>10}")

    top = (ecbs_edges(blocks, max_block_size=15)
           .map_batches(lambda t: t.sort_by([("ecbs", "descending")])
                        .slice(0, 5), batch_format="pyarrow")
           .to_pandas()
           .sort_values("ecbs", ascending=False).head(5))
    print("\ntop ECBS-weighted candidate pairs:")
    print(top.to_string(index=False))
    ray.shutdown()


if __name__ == "__main__":
    main()
