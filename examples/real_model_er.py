"""Run the REAL-MODEL extraction path end to end (VERDICT r3 #10).

This sandbox ships no model weights, so the engine's default extractor
is the deterministic rule stand-in; the production path
(``stages/spacy_extract.py``, mirroring reference ``pipe.py:440-511``)
is gated behind ``import spacy``.  This script is the exact recipe a
user follows to exercise it:

    pip install spacy
    python -m spacy download en_core_web_sm
    python examples/real_model_er.py [n_docs] [sf_dir]

What it does (the contract test ``tests/test_full_pipeline.py::
test_real_model_script_contract`` pins the schema-parity assert and
the clean no-spacy exit without model downloads):

1. reads ``n_docs`` (default 100) documents from the testdata parquet,
2. runs ``registry.extractors["spacy"]`` via its StageSpec — an
   actor-pool ``map_batches`` whose model loads ONCE per actor in
   ``__init__``,
3. asserts SPAN-SCHEMA PARITY: the spaCy spans table carries exactly
   the canonical ``schema.SPANS`` columns, so every downstream stage
   (mentions, blocking, scoring, closure) accepts it unchanged,
4. pushes the spans through mentions → blocking → scoring →
   transitive closure and prints the cluster count — the flagship
   chain on real model output (``kinds`` includes ``lem`` because the
   driver corpus has no named entities; see CLAUDE.md).
"""

from __future__ import annotations

import sys


def main(n_docs: int = 100,
         sf_dir: str = "/root/testdata/sf0.001") -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    from textgraphs_ray.registry import registry

    if "spacy" not in registry.extractors:
        print("spacy is not installed - install with:\n"
              "  pip install spacy\n"
              "  python -m spacy download en_core_web_sm")
        return 2

    import ray.data as rd

    from textgraphs_ray.pipelines.er import mentions_from_spans
    from textgraphs_ray.schema import SPANS
    from textgraphs_ray.stages.blocking import candidate_pairs
    from textgraphs_ray.stages.cluster import propagate_labels
    from textgraphs_ray.stages.scoring import score_pairs

    docs = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
            .limit(n_docs).materialize())

    spec = registry.extractors["spacy"]
    spans = spec.apply(docs).materialize()
    got = list(spans.schema().names)
    want = list(SPANS.names)
    assert got == want, f"span-schema parity broken: {got} != {want}"
    print(f"spans: {spans.count()} rows, schema parity OK")

    mentions = mentions_from_spans(
        spans, None, kinds=("ent", "media", "lem")).materialize()
    pairs = candidate_pairs(mentions)
    matches = score_pairs(pairs).materialize()
    clusters = propagate_labels(mentions, matches)
    print(f"clusters from real-model spans: {clusters.count()}")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 100,
                  sys.argv[2] if len(sys.argv) > 2 else
                  "/root/testdata/sf0.001"))
