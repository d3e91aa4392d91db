#!/usr/bin/env python
"""Demo mirroring the reference's ``demo.py`` flow (reference
demo.py:25-150) on the Ray engine: parse → collect → link → lemma
graph → phrase ranks → relation inference → exports — through the
reference-compatible façade, then the same corpus through the
distributed flagship chain.

Run: ``python examples/demo.py`` (owns its Ray session)."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

SRC_TEXT = """
Werner Herzog is a remarkable filmmaker and an intellectual originally from Germany, the son of Dietrich Herzog.
After the war, Werner visited America to become famous.
"""


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd
    rd.DataContext.get_current().enable_progress_bars = False

    import textgraphs_ray.compat as textgraphs

    t0 = time.perf_counter()
    tg = textgraphs.TextGraphs(factory=textgraphs.PipelineFactory())
    pipe = tg.create_pipeline(SRC_TEXT.strip())
    tg.collect_graph_elements(pipe)
    tg.perform_entity_linking(pipe)
    tg.construct_lemma_graph()
    tg.calc_phrase_ranks()

    print("=== ranked phrases (reference get_phrases_as_df) ===")
    print(tg.get_phrases_as_df().head(8).to_string())

    print("\n=== inferred relations ===")
    print(tg.infer_relations().head(5).to_string())

    print("\n=== RDF export (first 5 triples) ===")
    print("\n".join(tg.export_rdf().splitlines()[:5]))

    print("\n=== entity clusters ===")
    print(tg.resolve_entities().to_string())
    print(f"\nfacade lifecycle: {time.perf_counter() - t0:.2f}s")

    # distributed flagship on a synthetic corpus
    from textgraphs_ray.corpus import generate
    from textgraphs_ray.evaluate import er_f1_against_truth
    from textgraphs_ray.pipelines.er import resolve_entities

    import pyarrow as pa
    import pyarrow.compute as pc

    docs, truth, assets = generate(5000)
    t0 = time.perf_counter()
    res = resolve_entities(rd.from_arrow(docs), assets=assets,
                           num_partitions=8)
    n = res["clusters"].count()
    dt = time.perf_counter() - t0
    spans = res["spans"].map_batches(
        lambda t: t.filter(pc.is_in(t.column("kind"),
                                    value_set=pa.array(["ent", "media"])))
        .select(["doc_id", "offset", "lemma_key"]),
        batch_format="pyarrow").to_pandas()
    p, r, f1 = er_f1_against_truth(spans, res["clusters"].to_pandas(),
                                   truth.to_pandas())
    print(f"\nflagship: 5000 docs -> {n} clusters in {dt:.1f}s "
          f"({5000 / dt:.0f} docs/s), pairwise F1={f1:.4f}")
    ray.shutdown()


if __name__ == "__main__":
    main()
