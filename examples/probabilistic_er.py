"""Probabilistic entity resolution end-to-end: the record-linkage
textbook chain on the generated corpus.

    blocking (multi-pass LSH + phonetic)            stages/blocking.py
      → Fellegi–Sunter EM scoring (pattern histogram) stages/linkage.py
      → transitive closure                            stages/cluster.py
      → golden-record survivorship                    stages/cluster.py

Contrast with the flagship `pipelines/er.py`, which scores pairs with
the deterministic threshold scorer; here the match/non-match decision
is LEARNED from the pair population itself (no labels, no thresholds
to hand-tune), then closure and survivorship run unchanged.

Run: python examples/probabilistic_er.py  (owns its Ray session)
"""

from __future__ import annotations

import sys

import ray
import ray.data as rd

sys.path.insert(0, "/root/repo")

from textgraphs_ray.corpus import generate                     # noqa: E402
from textgraphs_ray.pipelines.er import (extract_spans,        # noqa: E402
                                         mentions_from_spans)
from textgraphs_ray.stages.blocking import candidate_pairs     # noqa: E402
from textgraphs_ray.stages.cluster import (golden_records,     # noqa: E402
                                           propagate_labels)
from textgraphs_ray.stages.linkage import fellegi_sunter       # noqa: E402


def main() -> None:
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8,
                 include_dashboard=False, logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False

    docs, _, assets = generate(2000)
    spans = extract_spans(rd.from_arrow(docs), concurrency=(1, 2))
    mentions = mentions_from_spans(spans, ray.put(assets),
                                   kinds=("ent", "media", "lem"))
    pairs = candidate_pairs(mentions, dedup=True)

    fs = fellegi_sunter(pairs, iters=40, tau=0.5)
    print("EM fit: p =", round(fs["model"]["p"], 4))
    print(fs["patterns"].to_string(index=False))

    edges = (fs["scored"].filter(expr="is_match == True")  # noqa: E712
             .map_batches(lambda t: t.select(["key_a", "key_b"])
                          .rename_columns(["key_a", "key_b"]),
                          batch_format="pyarrow"))
    clusters = propagate_labels(mentions, edges, num_partitions=8)
    print("clusters:", clusters.count())

    golden = golden_records(clusters, spans, num_partitions=8)
    print(golden.to_pandas().sort_values("n_occurrences",
                                         ascending=False)
          .head(10).to_string(index=False))
    ray.shutdown()


if __name__ == "__main__":
    main()
