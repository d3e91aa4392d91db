#!/usr/bin/env python
"""End-to-end retrieval-corpus preparation on the Ray engine — the
RAG-side operators chained the way an indexing run uses them:

    quality filter ──► overlapping window chunking (chunk_windows)
        ──► BM25 lexical retrieval over the chunks (bm25_topk)
        ──► embedding side: distributed PCA whitening (pca_train /
            pca_project) ──► PQ compression (pq_train / pq_encode)
            ──► compressed ANN query (knn_pq) vs the brute oracle

Every stage is a streaming Dataset transform; the only driver-side
state is the tiny trained models (PCA components, PQ codebooks) that
broadcast once.  Run: ``python examples/retrieval_prep.py`` (owns its
Ray session; reads the driver testdata at $GRAFT_SF_DIR or sf0.01).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    import numpy as np
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd
    rd.DataContext.get_current().enable_progress_bars = False

    from textgraphs_ray.stages.pca import pca_project, pca_train
    from textgraphs_ray.stages.similarity import knn_brute, knn_pq
    from textgraphs_ray.stages.text import QualityScorer, chunk_windows
    from textgraphs_ray.stages.tfidf import bm25_topk

    t0 = time.perf_counter()

    # --- text side: filter → chunk → lexical retrieval ---
    docs = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"])
    kept = (docs.map_batches(QualityScorer, batch_format="pyarrow",
                             concurrency=2)
            .filter(expr="quality_score > 0.2")
            .select_columns(["doc_id", "text"]))
    chunks = chunk_windows(kept, size=400, stride=320)
    n_chunks = chunks.count()

    def chunk_key(t):
        import pyarrow as pa
        import pyarrow.compute as pc
        ck = pc.binary_join_element_wise(
            pc.cast(t.column("doc_id"), pa.string()),
            pc.cast(t.column("chunk_id"), pa.string()), "#")
        return t.append_column("ckey", ck)

    hits = bm25_topk(chunks.map_batches(chunk_key, batch_format="pyarrow"),
                     ["hash", "join", "scan"], k=5,
                     text_col="chunk_text", id_col="ckey")
    print(f"chunks: {n_chunks}; top BM25 chunk hits:")
    print(hits.to_string(index=False))

    # --- embedding side: PCA whiten → PQ compress → ANN ---
    emb = rd.read_parquet(f"{SF_DIR}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    model = pca_train(emb, 32)
    reduced = pca_project(emb, model).select_columns(["vec_id", "pca"]) \
        .map_batches(lambda t: t.rename_columns(["vec_id", "embedding"]),
                     batch_format="pyarrow")
    queries = np.stack([r["embedding"]
                        for r in reduced.limit(4).take_all()])
    approx = knn_pq(reduced, queries, k=5, m_sub=8, n_centroids=64)
    exact = knn_brute(reduced, queries, k=5)
    overlap = 0
    for qi in range(len(queries)):
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        overlap += len(a & e)
    print(f"PCA dims: {model['components'].shape}; "
          f"PQ recall@5 vs brute on {len(queries)} queries: "
          f"{overlap / (5 * len(queries)):.2f}")
    print(f"total wall: {time.perf_counter() - t0:.1f}s")
    ray.shutdown()


if __name__ == "__main__":
    main()
