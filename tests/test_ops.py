"""Tests for the training-data operators: dedup family, similarity
search, text analysis, media plumbing, relations, exports."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


@pytest.fixture(scope="module")
def dup_docs():
    """Documents with planted exact + near duplicates."""
    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "into the quiet green forest before sunset tonight")
    import random
    rng = random.Random(7)
    vocab = [f"w{c}{v}" for c in "bcdfghjklmnpqrstvz" for v in "aeiou"]
    rows = []
    for i in range(20):
        words = rng.sample(vocab, 18)
        rows.append({"doc_id": i, "text": " ".join(words)})
    rows.append({"doc_id": 100, "text": base})
    rows.append({"doc_id": 101, "text": base})                      # exact dup
    rows.append({"doc_id": 102, "text": base.replace("dog", "cat")})  # near dup
    rows.append({"doc_id": 103, "text": base.replace("quick", "quik")})
    return pa.Table.from_pylist(rows)


def test_exact_dedup(dup_docs):
    from textgraphs_ray.stages.dedup import exact_dedup

    out = exact_dedup(rd.from_arrow(dup_docs)).to_pandas()
    assert out["n_dups"].sum() == dup_docs.num_rows
    dups = out[out["n_dups"] > 1]
    assert len(dups) == 1
    assert dups.iloc[0]["keeper"] == 100
    assert dups.iloc[0]["n_dups"] == 2


def test_minhash_dedup_clusters_near_dups(dup_docs):
    from textgraphs_ray.stages.dedup import minhash_dedup

    out = minhash_dedup(rd.from_arrow(dup_docs),
                        jaccard_threshold=0.6).to_pandas()
    cl = dict(zip(out["key"], out["cluster_id"]))
    assert cl["100"] == cl["101"] == cl["102"] == cl["103"]
    assert cl["0"] != cl["100"]
    assert len(set(cl.values())) == 21  # 20 uniques + 1 dup cluster


def test_simhash_dedup(dup_docs):
    from textgraphs_ray.stages.dedup import simhash_dedup

    out = simhash_dedup(rd.from_arrow(dup_docs), max_hamming=6).to_pandas()
    cl = dict(zip(out["key"], out["cluster_id"]))
    assert cl["100"] == cl["101"]  # exact dup always simhash-identical
    assert cl["0"] != cl["100"]


def test_embedding_dedup():
    from textgraphs_ray.stages.dedup import embedding_dedup

    rng = np.random.RandomState(0)
    base = rng.standard_normal(32).astype(np.float32)
    rows = []
    for i in range(10):
        rows.append({"vec_id": i,
                     "embedding": rng.standard_normal(32).astype(
                         np.float32).tolist()})
    rows.append({"vec_id": 100, "embedding": base.tolist()})
    rows.append({"vec_id": 101,
                 "embedding": (base + 0.01 * rng.standard_normal(32)
                               .astype(np.float32)).tolist()})
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = embedding_dedup(ds, cosine_threshold=0.98).to_pandas()
    cl = dict(zip(out["key"], out["cluster_id"]))
    assert cl["100"] == cl["101"]
    assert cl["0"] != cl["100"]


def test_knn_brute_exact():
    from textgraphs_ray.stages.similarity import knn_brute

    rng = np.random.RandomState(1)
    emb = rng.standard_normal((50, 16)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(range(50), pa.int64()),
                  "embedding": [e.tolist() for e in emb]})
    q = emb[:3]
    got = knn_brute(rd.from_arrow(t), q, k=4)
    # brute-force numpy oracle
    en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = en @ qn.T
    for qi in range(3):
        order = np.argsort(-sims[:, qi], kind="stable")[:4]
        mine = got[got["query_id"] == qi].sort_values("rank")["vec_id"]
        assert set(mine) == set(order.tolist())
        assert mine.iloc[0] == qi  # self is the nearest


def test_knn_lsh_recall():
    from textgraphs_ray.stages.similarity import knn_brute, knn_lsh

    rng = np.random.RandomState(2)
    emb = rng.standard_normal((200, 16)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(range(200), pa.int64()),
                  "embedding": [e.tolist() for e in emb]})
    q = emb[:5]
    exact = knn_brute(rd.from_arrow(t), q, k=5)
    approx = knn_lsh(rd.from_arrow(t), q, k=5, planes=6)
    # at least the self-match must always be found; overall recall > 0.4
    hits = 0
    for qi in range(5):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        assert qi in a
        hits += len(e & a)
    assert hits / 25 > 0.4


def test_knn_lsh_zero_planes_is_brute():
    """planes=0 ⇒ one all-inclusive bucket ⇒ output-identical to
    knn_brute (the knn_lsh_oracle forced-plan contract)."""
    from textgraphs_ray.stages.similarity import knn_brute, knn_lsh

    rng = np.random.RandomState(7)
    emb = rng.standard_normal((120, 16)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(range(120), pa.int64()),
                  "embedding": [e.tolist() for e in emb]})
    q = emb[:4]
    exact = knn_brute(rd.from_arrow(t), q, k=5, exclude_self=True)
    full = knn_lsh(rd.from_arrow(t), q, k=5, planes=0, exclude_self=True)
    pd.testing.assert_frame_equal(
        exact.reset_index(drop=True), full.reset_index(drop=True),
        check_exact=False, atol=1e-6)


def test_text_analysis_stages():
    from textgraphs_ray.stages.text import (Fingerprinter, LangId,
                                            QualityScorer, TokenCounter)

    t = pa.table({"doc_id": [1, 2, 3],
                  "text": ["The quick brown fox, with the lazy dog.",
                           "el perro y el gato en la casa de la abuela",
                           ""]})
    ds = rd.from_arrow(t)
    out = (ds.map_batches(TokenCounter, batch_format="pyarrow",
                          concurrency=(1, 2))
           .map_batches(QualityScorer, batch_format="pyarrow",
                        concurrency=(1, 2))
           .map_batches(LangId, batch_format="pyarrow", concurrency=(1, 2))
           .map_batches(Fingerprinter, batch_format="pyarrow",
                        concurrency=(1, 2))).to_pandas()
    out = out.set_index("doc_id")
    assert out.loc[1, "n_tokens"] == 8
    assert out.loc[1, "lang_pred"] == "en"
    assert out.loc[2, "lang_pred"] == "es"
    assert out.loc[1, "punct_ratio"] > 0
    assert out.loc[1, "stopword_ratio"] > 0.2
    import hashlib
    assert out.loc[3, "fp_md5"] == hashlib.md5(b"").hexdigest()
    # identical normalized words → identical rolling fp
    t2 = pa.table({"doc_id": [1, 2],
                   "text": ["a  b   c", "a b c"]})
    fp = rd.from_arrow(t2).map_batches(
        Fingerprinter, batch_format="pyarrow",
        concurrency=(1, 2)).to_pandas()
    assert fp["fp_rolling"].iloc[0] == fp["fp_rolling"].iloc[1]


def test_media_plumbing():
    from textgraphs_ray.stages.media import (DecodeStub, FrameSampler,
                                             MediaFeaturizer,
                                             synth_media_table)

    t = synth_media_table(30)
    ds = rd.from_arrow(t)
    feats = (ds.map_batches(DecodeStub, batch_format="pyarrow",
                            batch_size=8, concurrency=(1, 2))
             .map_batches(MediaFeaturizer, batch_format="pyarrow",
                          batch_size=8, concurrency=(1, 2))).to_pandas()
    assert len(feats) == 30
    assert all(len(e) == 64 for e in feats["embedding"])
    # determinism: same payload → same embedding
    again = (rd.from_arrow(t).map_batches(
        MediaFeaturizer, batch_format="pyarrow",
        concurrency=(1, 2))).to_pandas()
    np.testing.assert_allclose(np.stack(feats["embedding"].to_numpy()),
                               np.stack(again["embedding"].to_numpy()))

    frames = ds.map_batches(FrameSampler, batch_format="pyarrow",
                            batch_size=8, concurrency=(1, 2)).to_pandas()
    assert (frames["frame_idx"] % 4 == 0).all()
    assert len(frames) > 0
    # reel frames are REAL decodable PPM images
    from textgraphs_ray.functions.imaging import decode_ppm
    assert decode_ppm(frames["frame"].iloc[0]).shape == (8, 8, 3)

    # raw formats decode for REAL: image rows report pixel dims
    dec = ds.map_batches(DecodeStub, batch_format="pyarrow",
                         concurrency=1).to_pandas()
    imgs = dec[dec["media_type"] == "image"]
    assert (imgs["codec"] == "ppm").all()
    assert (imgs["decoded_w"] > 0).all() and (imgs["decoded_h"] > 0).all()
    assert (dec[dec["media_type"] == "audio"]["codec"] == "wav").all()

    # strict mode marks the compressed-codec boundary: raw payloads
    # pass, an unknown payload raises
    ok = rd.from_arrow(t.slice(0, 2)).map_batches(
        DecodeStub, batch_format="pyarrow", concurrency=1,
        fn_constructor_kwargs={"strict": True})
    assert ok.count() == 2
    junk = pa.table({"media_ref": ["m://x"], "media_type": ["image"],
                     "payload": [b"\x89PNG fake compressed bytes"],
                     "width": [0], "height": [0], "duration_ms": [0]})
    strict = rd.from_arrow(junk).map_batches(
        DecodeStub, batch_format="pyarrow", concurrency=1,
        fn_constructor_kwargs={"strict": True})
    with pytest.raises(Exception):
        strict.count()


def test_rebel_parser():
    from textgraphs_ray.stages.relations import parse_rebel_triplets

    decoded = ("<s><triplet> Werner Herzog <per> Germany <loc> "
               "country of citizenship</s>")
    out = parse_rebel_triplets(decoded)
    assert out == [{"head": "Werner Herzog", "head_type": "per",
                    "type": "country of citizenship",
                    "tail": "Germany", "tail_type": "loc"}]

    two = ("<triplet> A <per> B <loc> born in "
           "<triplet> C <org> D <loc> located in")
    out2 = parse_rebel_triplets(two)
    assert len(out2) == 2
    assert out2[1] == {"head": "C", "head_type": "org",
                       "type": "located in", "tail": "D",
                       "tail_type": "loc"}


def test_infer_relations(small_corpus):
    from textgraphs_ray.stages.relations import infer_relations

    docs, _, _ = small_corpus
    edges = infer_relations(rd.from_arrow(docs)).to_pandas()
    assert len(edges) > 0
    assert (edges["kind"] == "inf").all()
    assert (edges["prob"] >= 0.9).all()
    assert edges["rel"].str.startswith("http://www.wikidata.org/").all()


def test_exports(small_corpus):
    from textgraphs_ray.pipelines.er import extract_spans
    from textgraphs_ray.sources.exports import export_kuzu_csv, export_rdf
    from textgraphs_ray.stages.graph import (build_edges, build_nodes,
                                             extract_raw_edges)
    import tempfile, os

    docs, _, _ = small_corpus
    docs_ds = rd.from_arrow(docs.slice(0, 40))
    nodes = build_nodes(extract_spans(docs_ds)).materialize()
    edges = build_edges(docs_ds.map_batches(
        extract_raw_edges, batch_format="pyarrow")).materialize()

    triples = export_rdf(nodes, edges).to_pandas()
    assert len(triples) > 0
    assert triples["triple"].str.endswith(" .").all()

    with tempfile.TemporaryDirectory() as d:
        export_kuzu_csv(nodes, edges, d)
        assert os.listdir(os.path.join(d, "nodes"))
        assert os.listdir(os.path.join(d, "edges"))


def test_knn_ivf_recall():
    from textgraphs_ray.stages.similarity import knn_brute, knn_ivf

    rng = np.random.RandomState(3)
    emb = rng.standard_normal((300, 16)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(range(300), pa.int64()),
                  "embedding": [e.tolist() for e in emb]})
    q = emb[:5]
    exact = knn_brute(rd.from_arrow(t), q, k=5)
    approx = knn_ivf(rd.from_arrow(t), q, k=5, ncells=8, nprobe=3)
    hits = 0
    for qi in range(5):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        assert qi in a  # self lives in the query's own nearest cell
        hits += len(e & a)
    assert hits / 25 > 0.5


def test_ngram_jaccard_dedup(dup_docs):
    from textgraphs_ray.stages.dedup import ngram_jaccard_dedup

    out = ngram_jaccard_dedup(rd.from_arrow(dup_docs), threshold=0.5,
                              concurrency=1).to_pandas()
    cl = dict(zip(out["key"], out["cluster_id"]))
    # exact + near dups cluster together; unrelated docs stay separate
    assert cl["100"] == cl["101"] == cl["102"]
    assert cl["100"] != cl["0"]


def test_chunk_dedup_strips_repeated_windows():
    from textgraphs_ray.stages.dedup import chunk_dedup

    shared = " ".join(f"s{i}" for i in range(20))   # exact 20-word window
    uniq_a = " ".join(f"a{i}" for i in range(20))
    tail = " ".join(f"b{i}" for i in range(7))      # short tail chunk
    rows = [
        {"doc_id": 1, "text": f"{shared} {uniq_a}"},
        {"doc_id": 2, "text": f"{shared}  {tail}"},  # double space normalizes
        {"doc_id": 3, "text": tail},                 # repeats doc 2's tail
        {"doc_id": 4, "text": ""},
    ]
    out = (chunk_dedup(rd.from_arrow(pa.Table.from_pylist(rows)),
                       words_per_chunk=20, min_count=2)
           .to_pandas().set_index("doc_id"))
    # shared window (docs 1,2) and tail chunk (docs 2,3) stripped
    # everywhere; unique window survives; whitespace normalized
    assert out.loc[1, "text_dedup"] == uniq_a
    assert out.loc[2, "text_dedup"] == ""
    assert out.loc[3, "text_dedup"] == ""
    assert out.loc[4, "text_dedup"] == ""
    assert out.loc[1, "n_chunks"] == 2 and out.loc[1, "n_dropped"] == 1
    assert out.loc[2, "n_chunks"] == 2 and out.loc[2, "n_dropped"] == 2
    assert out.loc[4, "n_chunks"] == 0 and out.loc[4, "n_dropped"] == 0


def test_chunk_and_substring_dedup_join_plan_parity():
    """Forcing the hash-partitioned semi-join plan (dup_broadcast_max=0)
    must reproduce the broadcast plan exactly — same strip decisions,
    same counts — on a corpus with planted repeats."""
    from textgraphs_ray.stages.dedup import chunk_dedup, substring_dedup

    rng = np.random.RandomState(3)
    vocab = [f"v{i}" for i in range(60)]
    shared = " ".join(f"s{i}" for i in range(25))
    rows = []
    for i in range(30):
        body = " ".join(rng.choice(vocab, size=rng.randint(10, 60)))
        text = f"{shared} {body}" if i % 3 == 0 else body
        rows.append({"doc_id": i, "text": text})
    rows.append({"doc_id": 98, "text": ""})
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    for fn, kw in ((chunk_dedup, {"words_per_chunk": 10}),
                   (substring_dedup, {"window": 8})):
        base = (fn(ds, min_count=2, **kw).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))
        join = (fn(ds, min_count=2, dup_broadcast_max=0,
                   num_partitions=5, **kw).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(base, join[base.columns],
                                      check_dtype=False)


def test_chunk_dedup_no_dups_is_identity():
    from textgraphs_ray.stages.dedup import chunk_dedup

    rows = [{"doc_id": i, "text": " ".join(f"u{i}x{j}" for j in range(33))}
            for i in range(5)]
    out = (chunk_dedup(rd.from_arrow(pa.Table.from_pylist(rows)))
           .to_pandas().set_index("doc_id"))
    for i in range(5):
        assert out.loc[i, "text_dedup"] == rows[i]["text"]
        assert out.loc[i, "n_dropped"] == 0


def test_kuzu_export_roundtrip(tmp_path, small_corpus):
    import ray.data as rdm

    from textgraphs_ray.pipelines.er import extract_spans
    from textgraphs_ray.sources.exports import export_kuzu_csv
    from textgraphs_ray.stages.graph import (build_edges, build_nodes,
                                             extract_raw_edges)

    docs, _, _ = small_corpus
    docs_ds = rd.from_arrow(docs)
    nodes = build_nodes(extract_spans(docs_ds, concurrency=1))
    edges = build_edges(docs_ds.map_batches(extract_raw_edges,
                                            batch_format="pyarrow"))
    n_nodes = nodes.count()
    export_kuzu_csv(nodes, edges, str(tmp_path))
    back = rdm.read_csv(str(tmp_path / "nodes"))
    assert back.count() == n_nodes
    assert "key" in back.schema().names


def test_empty_inputs_are_graceful():
    """Every operator family returns an empty, well-typed result on an
    empty dataset (no crashes at partition boundaries)."""
    from textgraphs_ray.stages.dedup import exact_dedup, minhash_dedup
    from textgraphs_ray.stages.similarity import knn_brute, knn_ivf, knn_lsh

    empty_docs = pa.table({"doc_id": pa.array([], pa.string()),
                           "text": pa.array([], pa.string())})
    assert exact_dedup(rd.from_arrow(empty_docs)).count() == 0
    assert minhash_dedup(rd.from_arrow(empty_docs),
                         concurrency=1).count() == 0

    emb = pa.table({"vec_id": pa.array([], pa.int64()),
                    "embedding": pa.array([], pa.list_(pa.float32()))})
    q = np.zeros((2, 8), dtype=np.float32)
    q[:, 0] = 1.0
    for fn in (knn_brute, knn_lsh, knn_ivf):
        out = fn(rd.from_arrow(emb), q, k=3)
        assert len(out) == 0
        assert list(out.columns) == ["query_id", "rank", "vec_id", "sim"]


def test_resize_stub():
    from textgraphs_ray.stages.media import ResizeStub, synth_media_table

    from textgraphs_ray.functions.imaging import decode_ppm

    t = synth_media_table(12)
    out = rd.from_arrow(t).map_batches(
        ResizeStub, batch_format="pyarrow", batch_size=4,
        concurrency=1).to_pandas()
    assert (out["out_w"] == 64).all()
    # decodable payloads (PPM images + PPM-reel first frames) are
    # REALLY resized: output decodes as a 64x64 PPM
    ppm_rows = out[out["resized"].apply(lambda b: b[:2] == b"P6")]
    assert len(ppm_rows) > 0
    for b in ppm_rows["resized"]:
        assert decode_ppm(b).shape == (64, 64, 3)
    # undecodable payloads (WAV audio here) use the byte downsampler
    other = out[out["media_type"] == "audio"]
    assert (other["resized"].str.len() <= 64 * 64).all()
    # strict mode marks the compressed-codec boundary
    junk = pa.table({"media_ref": ["m://x"], "media_type": ["image"],
                     "payload": [b"\x89PNG fake compressed bytes"],
                     "width": [0], "height": [0], "duration_ms": [0]})
    strict = rd.from_arrow(junk).map_batches(
        ResizeStub, batch_format="pyarrow", concurrency=1,
        fn_constructor_kwargs={"strict": True})
    with pytest.raises(Exception):
        strict.count()


def test_curate_corpus(dup_docs):
    from textgraphs_ray.pipelines.curate import curate_corpus

    res = curate_corpus(rd.from_arrow(dup_docs), min_quality=0.0,
                        langs=("en", "und"), jaccard_threshold=0.6,
                        concurrency=1)
    stats = res["stats"]
    out_ids = {str(r["doc_id"]) for r in res["docs"].iter_rows()}
    assert stats["input"] == dup_docs.num_rows
    # exact dup (101) and near dups (102, 103) dropped; keeper 100 kept
    assert "100" in out_ids or 100 in {r["doc_id"]
                                       for r in res["docs"].iter_rows()}
    dropped = {str(i) for i in (101, 102, 103)}
    assert not (dropped & {str(i) for i in out_ids})
    assert stats["output"] == stats["after_quality_lang"] \
        - stats["exact_dup_losers"] - stats["near_dup_losers"]


def test_curate_loser_plans_output_identical(dup_docs):
    """loser_plan="join" (hash-partitioned anti join, losers never on
    the driver) must match the broadcast plan: same survivors, same
    per-stage stats — with near-dedup active AND disabled (threshold
    2.0, where exact⊆near does not hold)."""
    from textgraphs_ray.pipelines.curate import curate_corpus

    for thr in (0.6, 2.0):
        res_b = curate_corpus(rd.from_arrow(dup_docs), min_quality=0.0,
                              langs=("en", "und"), jaccard_threshold=thr,
                              concurrency=1)
        res_j = curate_corpus(rd.from_arrow(dup_docs), min_quality=0.0,
                              langs=("en", "und"), jaccard_threshold=thr,
                              concurrency=1, loser_plan="join",
                              num_partitions=4)
        ids_b = sorted(str(r["doc_id"]) for r in res_b["docs"].iter_rows())
        ids_j = sorted(str(r["doc_id"]) for r in res_j["docs"].iter_rows())
        assert ids_b == ids_j, f"survivors diverged at thr={thr}"
        assert res_b["stats"] == res_j["stats"], f"stats diverged at {thr}"
        assert res_j["docs"].schema().names == res_b["docs"].schema().names


def test_knn_merge_paths_agree():
    """The distributed groupby merge (large Q) and the driver merge
    (small Q) must produce identical top-k tables."""
    import pandas as pd

    from textgraphs_ray.stages import similarity as sim

    rng = np.random.RandomState(7)
    emb = rng.standard_normal((300, 16)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(np.arange(300), pa.int64()),
                  "embedding": pa.array(list(emb))})
    q = emb[:70]  # 70 queries > _DRIVER_MERGE_MAX_Q → distributed path
    big = sim.knn_brute(rd.from_arrow(t), q, k=3, exclude_self=True)
    orig = sim._DRIVER_MERGE_MAX_Q
    try:
        sim._DRIVER_MERGE_MAX_Q = 10_000  # force driver path
        small = sim.knn_brute(rd.from_arrow(t), q, k=3, exclude_self=True)
    finally:
        sim._DRIVER_MERGE_MAX_Q = orig
    pd.testing.assert_frame_equal(
        big.reset_index(drop=True), small.reset_index(drop=True))


def test_hll_distinct_accuracy():
    """HLL estimate within ~3× the theoretical error (1.04/sqrt(m)) of
    the exact distinct count, at several cardinalities, grouped and
    global; merge across blocks must equal a single-pass build."""
    from textgraphs_ray.functions.hll import (estimate, hll_agg,
                                              update_registers)

    for n in (100, 5_000, 60_000):
        vals = np.array([f"user-{i}" for i in range(n)], dtype=object)
        regs = np.zeros(4096, np.int8)
        update_registers(regs, vals, 12)
        est = estimate(regs)
        assert abs(est - n) / n < 3 * 1.04 / 64, (n, est)
        # split-merge invariance
        r1 = np.zeros(4096, np.int8)
        r2 = np.zeros(4096, np.int8)
        update_registers(r1, vals[: n // 2], 12)
        update_registers(r2, vals[n // 2:], 12)
        assert estimate(np.maximum(r1, r2)) == est

    t = pa.table({"g": pa.array(["a"] * 1000 + ["b"] * 1000),
                  "u": pa.array([f"x{i % 300}" for i in range(1000)]
                                + [f"y{i}" for i in range(1000)])})
    out = (rd.from_arrow(t).groupby("g")
           .aggregate(hll_agg("u", alias_name="nd")).to_pandas()
           .set_index("g"))
    assert abs(out.loc["a", "nd"] - 300) / 300 < 0.06
    assert abs(out.loc["b", "nd"] - 1000) / 1000 < 0.06


def test_bottomk_sample_layout_invariant():
    """The bottom-k sample must be identical for any block layout
    (merge is a sorted union) and must equal the direct computation."""
    import hashlib

    from textgraphs_ray.functions.bottomk import bottomk_agg

    vals = [f"v{i}" for i in range(200)]
    expect = ",".join(v for _, v in sorted(
        (hashlib.md5(v.encode()).hexdigest(), v) for v in vals)[:5])
    t = pa.table({"g": pa.array(["x"] * 200), "u": pa.array(vals)})
    for nblocks in (1, 7):
        out = (rd.from_arrow(t).repartition(nblocks).groupby("g")
               .aggregate(bottomk_agg("u", k=5, alias_name="s"))
               .to_pandas())
        assert out.loc[0, "s"] == expect


def test_media_near_dup_images():
    """End-to-end multimodal dedup: real PPM decode → 8x8 thumbnail
    embedding → hyperplane-LSH embedding_dedup clusters a noisy copy
    with its original, not with unrelated images."""
    from textgraphs_ray.functions.imaging import encode_ppm
    from textgraphs_ray.stages.dedup import embedding_dedup
    from textgraphs_ray.stages.media import MediaFeaturizer

    rng = np.random.RandomState(11)
    base = rng.randint(0, 256, (24, 24, 3)).astype(np.int16)
    noisy = np.clip(base + rng.randint(-6, 7, base.shape), 0, 255)
    rows = [{"media_ref": "m://orig", "payload": encode_ppm(
                 base.astype(np.uint8))},
            {"media_ref": "m://noisy", "payload": encode_ppm(
                 noisy.astype(np.uint8))}]
    for i in range(10):
        rows.append({"media_ref": f"m://other{i}", "payload": encode_ppm(
            rng.randint(0, 256, (24, 24, 3)).astype(np.uint8))})
    t = pa.Table.from_pylist(rows)
    emb = rd.from_arrow(t).map_batches(
        MediaFeaturizer, batch_format="pyarrow", concurrency=1)
    clusters = embedding_dedup(emb, emb_col="embedding",
                               id_col="media_ref",
                               cosine_threshold=0.98).to_pandas()
    cl = dict(zip(clusters["key"], clusters["cluster_id"]))
    assert cl["m://orig"] == cl["m://noisy"]
    assert cl["m://other0"] != cl["m://orig"]


def test_repetition_scorer():
    from textgraphs_ray.stages.text import RepetitionScorer

    t = pa.table({"doc_id": [1, 2, 3],
                  "text": ["spam spam spam ham",
                           "a\nb\na\n\n  \nb",
                           ""]})
    out = rd.from_arrow(t).map_batches(
        RepetitionScorer, batch_format="pyarrow",
        concurrency=1).to_pandas().set_index("doc_id")
    assert abs(out.loc[1, "word_dup_ratio"] - 0.5) < 1e-9  # 2/4 distinct
    assert abs(out.loc[2, "line_dup_ratio"] - 0.5) < 1e-9  # 2/4 distinct
    assert out.loc[3, "word_dup_ratio"] == 0.0


def test_spotlight_client_path():
    """The HTTP linking kernel (request build + response parse + memo)
    verified with an injected opener — no network in this sandbox."""
    import io
    import json

    from textgraphs_ray.stages.link import EntityLinker, SpotlightClient

    canned = {"Resources": [
        {"@URI": "http://dbpedia.org/resource/Werner_Herzog",
         "@surfaceForm": "Werner Herzog", "@similarityScore": "0.99",
         "@support": "500"},
        {"@URI": "http://dbpedia.org/resource/Herzog_(novel)",
         "@surfaceForm": "Herzog", "@similarityScore": "0.4",
         "@support": "3"}]}
    seen_urls = []

    class FakeResp(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def opener(req):
        seen_urls.append(req.full_url)
        assert req.get_header("Accept") == "application/json"
        return FakeResp(json.dumps(canned).encode())

    client = SpotlightClient("http://spotlight.example/rest",
                             confidence=0.5, opener=opener)
    linker = EntityLinker(min_similarity=0.8, spotlight=client)
    t = pa.table({"key": ["werner.PROPN.herzog.PROPN"] * 2,
                  "text": ["Werner Herzog"] * 2, "kind": ["ent"] * 2})
    out = linker(t).to_pylist()
    # best above-threshold hit wins; the 0.4 candidate is filtered
    assert out[0]["iri"] == "http://dbpedia.org/resource/Werner_Herzog"
    assert "confidence=0.5" in seen_urls[0]
    assert "text=Werner+Herzog" in seen_urls[0]
    # per-actor memo: one HTTP round-trip for two identical surfaces
    assert client.n_requests == 1


def test_opennre_scorer_wiring():
    """The real-model relation kernel: registry gate matches the
    import, and an injected model drives label + prob through the pair
    loop (char spans follow the reference's get_pos convention)."""
    from textgraphs_ray.corpus import generate
    from textgraphs_ray.registry import registry
    from textgraphs_ray.stages.relations import (HAVE_OPENNRE,
                                                 OpenNREScorer,
                                                 RelationScorer)

    assert ("opennre" in registry.inferrers) == HAVE_OPENNRE
    if not HAVE_OPENNRE:
        with pytest.raises(ImportError):
            OpenNREScorer()

    calls = []

    class FakeModel:
        def infer(self, item):
            calls.append(item)
            text = item["text"]
            h0, h1 = item["h"]["pos"]
            assert text[h0:h1 + 1].strip() != ""
            return "fake_relation", 0.95

    docs, _, _ = generate(40)
    base = RelationScorer()(docs.slice(0, 40))
    out = OpenNREScorer(model=FakeModel())(docs.slice(0, 40))
    assert out.num_rows > 0
    assert set(out.column("rel_label").to_pylist()) == {"fake_relation"}
    assert all(abs(p - 0.95) < 1e-9
               for p in out.column("prob").to_pylist())
    # the model sees exactly the stand-in path's candidate pairs (same
    # span algebra; the 0.95 fake prob clears min_prob for all of them)
    assert len(calls) == out.num_rows
    assert {(r["src_key"], r["dst_key"]) for r in out.to_pylist()} >= \
        {(r["src_key"], r["dst_key"]) for r in base.to_pylist()}


def test_kmeans_distributed_and_ivf():
    """Distributed Lloyd's k-means (map-side partial sums, tiny
    groupby-style reduce) recovers well-separated clusters, and
    knn_ivf(train='distributed') finds exact self-matches."""
    from textgraphs_ray.stages.similarity import (kmeans_distributed,
                                                  knn_ivf)

    rng = np.random.RandomState(5)
    centers = np.eye(4, 16, dtype=np.float32) * 10
    rows = []
    for i in range(400):
        c = i % 4
        v = centers[c] + rng.standard_normal(16).astype(np.float32) * 0.2
        rows.append({"vec_id": i, "embedding": v.tolist()})
    t = pa.Table.from_pylist(rows)
    ds = rd.from_arrow(t).repartition(5)

    cent = kmeans_distributed(ds, 4, iters=5)
    assert cent.shape == (4, 16)
    # every true center has a centroid with cosine > 0.95
    cn = centers / np.linalg.norm(centers, axis=1, keepdims=True)
    sims = cn @ cent.T
    assert (sims.max(axis=1) > 0.95).all()

    q = np.stack([r["embedding"] for r in rows[:6]]).astype(np.float32)
    out = knn_ivf(ds, q, k=1, ncells=4, nprobe=1, train="distributed")
    got = out.set_index("query_id")["vec_id"]
    assert all(got.loc[i] == i for i in range(6))  # self is nearest


def test_tfidf_top_terms():
    from textgraphs_ray.stages.tfidf import top_tfidf_terms

    t = pa.table({"doc_id": [1, 2, 3],
                  "text": ["zebra zebra common", "common words here",
                           "words words zebra"]})
    out = top_tfidf_terms(rd.from_arrow(t), k=2).to_pandas()
    top1 = out[(out["doc_id"] == 1) & (out["rank"] == 0)].iloc[0]
    assert top1["term"] == "zebra"  # tf=2 and rarer than 'common'
    # rank is dense per doc, scores non-increasing
    for _, g in out.groupby("doc_id"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(len(g)))
        assert (g["tfidf"].diff().dropna() <= 1e-12).all()


def test_unigram_logprob():
    from textgraphs_ray.stages.tfidf import unigram_logprob

    t = pa.table({"doc_id": [1, 2],
                  "text": ["common common common", "rare common"]})
    out = unigram_logprob(rd.from_arrow(t)).to_pandas().set_index("doc_id")
    # doc of only the frequent word scores higher than one with a rare
    assert out.loc[1, "logprob"] > out.loc[2, "logprob"]
    assert out.loc[1, "n_words"] == 3


def test_tfidf_distributed_path_parity():
    """Forcing the hash-partitioned vocabulary join (broadcast_vocab_max=0)
    must reproduce the broadcast path byte-for-byte at the 6dp contract."""
    from textgraphs_ray.stages.tfidf import top_tfidf_terms

    rng = np.random.RandomState(7)
    vocab = [f"w{i:02d}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=rng.randint(3, 25)))
             for _ in range(60)]
    t = pa.table({"doc_id": list(range(60)), "text": texts})
    cols = ["doc_id", "rank", "term", "tfidf"]
    base = (top_tfidf_terms(rd.from_arrow(t), k=3).to_pandas()
            .sort_values(["doc_id", "rank"]).reset_index(drop=True)[cols])
    dist = (top_tfidf_terms(rd.from_arrow(t), k=3, broadcast_vocab_max=0,
                            num_partitions=5).to_pandas()
            .sort_values(["doc_id", "rank"]).reset_index(drop=True)[cols])
    pd.testing.assert_frame_equal(base, dist, check_dtype=False)


def test_unigram_logprob_distributed_path_parity_and_oov():
    from textgraphs_ray.stages.tfidf import unigram_logprob

    rng = np.random.RandomState(11)
    vocab = [f"w{i:02d}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=rng.randint(2, 20)))
             for _ in range(50)]
    t = pa.table({"doc_id": list(range(50)), "text": texts})
    cols = ["doc_id", "n_words", "logprob"]
    base = (unigram_logprob(rd.from_arrow(t)).to_pandas()
            .sort_values("doc_id").reset_index(drop=True)[cols])
    dist = (unigram_logprob(rd.from_arrow(t), broadcast_vocab_max=0,
                            num_partitions=4).to_pandas()
            .sort_values("doc_id").reset_index(drop=True)[cols])
    pd.testing.assert_frame_equal(base, dist, check_dtype=False)

    # OOV contract: a model trained on one corpus scoring a DISJOINT
    # corpus must not raise — unseen words take the documented floor,
    # identically on both physical paths
    stats_total = sum(len(x.split()) for x in texts)
    floor = round(float(np.log(0.5 / stats_total)), 6)
    other = pa.table({"doc_id": [999], "text": ["zzz zzz unseen"]})
    stats = rd.from_arrow(t)
    for bmax in (10**6, 0):
        out = (unigram_logprob(rd.from_arrow(other), stats_ds=stats,
                               broadcast_vocab_max=bmax,
                               num_partitions=4)
               .to_pandas().set_index("doc_id"))
        assert out.loc[999, "logprob"] == floor  # all-OOV doc = floor


def test_scrubber_and_compression_ratio():
    from textgraphs_ray.stages.text import CompressionRatio, Scrubber

    t = pa.table({"doc_id": [1, 2, 3],
                  "text": ["see https://ex.ample/path?q=1 and "
                           "mail bob.smith+x@ex-ample.co.uk  now",
                           "aaaa " * 50,
                           "the quick brown fox jumps over lazy dogs"]})
    out = (rd.from_arrow(t)
           .map_batches(Scrubber, batch_format="pyarrow", concurrency=1)
           .map_batches(CompressionRatio, batch_format="pyarrow",
                        concurrency=1)).to_pandas().set_index("doc_id")
    assert out.loc[1, "text_clean"] == "see <URL> and mail <EMAIL> now"
    # repetitive text compresses far below natural text
    assert out.loc[2, "compress_ratio"] < 0.2
    assert out.loc[3, "compress_ratio"] > 0.5


def test_curate_optional_filters():
    """Repetition + compressibility filters drop planted junk while
    default parameters leave the chain byte-identical."""
    from textgraphs_ray.pipelines.curate import curate_corpus

    rows = [{"doc_id": f"d{i}",
             "text": f"the quick brown fox number {i} jumps at dawn"}
            for i in range(12)]
    rows.append({"doc_id": "spam", "text": "buy buy " * 40})
    t = pa.Table.from_pylist(rows)
    res = curate_corpus(rd.from_arrow(t), min_quality=0.0,
                        langs=("en", "und"), jaccard_threshold=2.0,
                        max_word_dup_ratio=0.5, concurrency=1)
    ids = set(res["docs"].to_pandas()["doc_id"])
    assert "spam" not in ids
    assert "d0" in ids and len(ids) == 12


def test_kg_search_fallback_path():
    """Two-pass linking: a Spotlight miss falls through to the DBPedia
    Lookup client; alias Jaro-Winkler gates acceptance (min_alias)."""
    import io
    import json

    from textgraphs_ray.stages.link import (EntityLinker, KGSearchClient,
                                            SpotlightClient)

    class FakeResp(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def spotlight_opener(req):
        return FakeResp(json.dumps({"Resources": []}).encode())

    lookup = {"docs": [{
        "resource": ["http://dbpedia.org/resource/Germany"],
        "label": ["<B>Germany</B>"],
        "comment": ["country in Europe"],
        "redirectlabel": ["Deutschland", "Federal Republic of Germany"]}]}

    def search_opener(req):
        assert "query=Germany" in req.full_url
        return FakeResp(json.dumps(lookup).encode())

    linker = EntityLinker(
        min_similarity=0.9, min_alias=0.8,
        spotlight=SpotlightClient("http://s.example/rest",
                                  opener=spotlight_opener),
        kg_search=KGSearchClient("http://l.example/api/search",
                                 opener=search_opener))
    t = pa.table({"key": ["germany.PROPN"], "text": ["Germany"],
                  "kind": ["ent"]})
    out = linker(t).to_pylist()
    assert out[0]["iri"] == "http://dbpedia.org/resource/Germany"


def test_salted_aggregate_equals_plain():
    """Salting is a physical-plan choice only: a heavily skewed key
    aggregates to the same numbers through the salted two-stage path
    as through the plain groupby."""
    from ray.data.aggregate import Count, Sum

    from textgraphs_ray.functions.salted import salted_aggregate

    rng = np.random.RandomState(3)
    keys = ["hot"] * 5000 + [f"k{i}" for i in range(50)]
    vals = rng.randint(0, 100, len(keys))
    t = pa.table({"k": pa.array(keys), "v": pa.array(vals, pa.int64())})
    salted = (salted_aggregate(rd.from_arrow(t).repartition(7), "k",
                               sums=("v",), count_alias="n",
                               salt_width=8)
              .to_pandas().set_index("k").sort_index())
    plain = (rd.from_arrow(t).groupby("k")
             .aggregate(Sum("v", alias_name="v"), Count(alias_name="n"))
             .to_pandas().set_index("k").sort_index())
    assert (salted["v"] == plain["v"]).all()
    assert (salted["n"] == plain["n"]).all()
    assert salted.loc["hot", "n"] == 5000


def test_hist_quantile_block_invariance_and_accuracy():
    """Sketch result is identical under any block layout (mergeable
    state) and within one bin width of the exact quantile."""
    from textgraphs_ray.functions.histq import hist_quantile_agg

    rng = np.random.RandomState(3)
    vals = rng.uniform(0.0, 100.0, size=4000)
    t = pa.table({"g": pa.array(["a"] * 2000 + ["b"] * 2000),
                  "v": pa.array(vals)})
    width = 100.0 / 256
    results = []
    for nblocks in (1, 7):
        ds = rd.from_arrow(t).repartition(nblocks)
        out = (ds.groupby("g").aggregate(
            hist_quantile_agg("v", q=0.9, lo=0.0, hi=100.0, nbins=256,
                              alias_name="p90"))
            .to_pandas().sort_values("g").reset_index(drop=True))
        results.append(out)
    assert results[0].equals(results[1])
    for g, part in (("a", vals[:2000]), ("b", vals[2000:])):
        est = results[0].set_index("g").loc[g, "p90"]
        assert abs(est - np.quantile(part, 0.9)) <= width + 1e-9


def test_hist_quantile_empty_and_clamp():
    from textgraphs_ray.functions.histq import hist_quantile_agg

    # out-of-range values clamp into the edge bins instead of crashing
    t = pa.table({"g": ["x", "x", "x"], "v": [-5.0, 50.0, 500.0]})
    out = (rd.from_arrow(t).groupby("g").aggregate(
        hist_quantile_agg("v", q=0.5, lo=0.0, hi=100.0, nbins=10,
                          alias_name="p50")).to_pandas())
    assert out.loc[0, "p50"] == 50.0


def test_stratified_sample_deterministic_and_balanced():
    from textgraphs_ray.stages.sampling import stratified_sample

    rows = ([{"doc_id": f"a{i}", "source": "big"} for i in range(50)]
            + [{"doc_id": f"b{i}", "source": "tiny"} for i in range(3)])
    t = pa.Table.from_pylist(rows)
    results = []
    for nblocks in (1, 9):
        out = (stratified_sample(rd.from_arrow(t).repartition(nblocks),
                                 group_col="source", n=5)
               .to_pandas().sort_values(["source", "doc_id"])
               .reset_index(drop=True))
        results.append(out)
    # block-layout invariant, caps the big stratum, keeps all of the
    # small one
    assert results[0].equals(results[1])
    counts = results[0].groupby("source").size()
    assert counts["big"] == 5 and counts["tiny"] == 3
    # matches the md5-order oracle
    import hashlib
    want = sorted((hashlib.md5(f"a{i}".encode()).hexdigest(), f"a{i}")
                  for i in range(50))[:5]
    assert set(results[0][results[0]["source"] == "big"]["doc_id"]) == \
        {d for _, d in want}


def test_interleave_sources_ratio_and_determinism():
    from textgraphs_ray.stages.pack import interleave_sources

    rows = ([{"doc_id": f"w{i}", "source": "web"} for i in range(30)]
            + [{"doc_id": f"b{i}", "source": "book"} for i in range(10)]
            + [{"doc_id": f"x{i}", "source": "junk"} for i in range(5)])
    t = pa.Table.from_pylist(rows)
    outs = []
    for nblocks in (1, 6):
        out = (interleave_sources(
            rd.from_arrow(t).repartition(nblocks),
            weights={"web": 3, "book": 1}, stop="first_exhausted")
            .to_pandas().sort_values("pos").reset_index(drop=True))
        outs.append(out)
    assert outs[0].equals(outs[1])
    out = outs[0]
    # positions are dense 0..n-1; unlisted source dropped
    assert list(out["pos"]) == list(range(len(out)))
    assert set(out["source"]) == {"web", "book"}
    # every complete round of 4 holds exactly 3 web + 1 book
    rounds = min(30 // 3, 10 // 1)
    assert len(out) == rounds * 4
    for r in range(rounds):
        window = out.iloc[r * 4:(r + 1) * 4]["source"]
        assert (window == "web").sum() == 3 and (window == "book").sum() == 1
    # all_exhausted keeps every weighted row
    full = interleave_sources(rd.from_arrow(t), weights={"web": 3, "book": 1},
                              stop="all_exhausted").to_pandas()
    assert len(full) == 40


def test_interleave_bucket_plan_output_identical():
    """plan="bucket" (digest-prefix distributed rank) must be
    OUTPUT-IDENTICAL to the default whole-group plan on every stop
    mode and under skew (one source dominating), including a bucket
    count small enough that buckets actually split sources."""
    from textgraphs_ray.stages.pack import interleave_sources

    rows = ([{"doc_id": f"w{i}", "source": "web"} for i in range(80)]
            + [{"doc_id": f"b{i}", "source": "book"} for i in range(9)]
            + [{"doc_id": f"x{i}", "source": "junk"} for i in range(5)])
    t = pa.Table.from_pylist(rows)
    for stop in ("first_exhausted", "all_exhausted"):
        want = (interleave_sources(
            rd.from_arrow(t), weights={"web": 3, "book": 1}, stop=stop)
            .to_pandas().sort_values("pos").reset_index(drop=True))
        got = (interleave_sources(
            rd.from_arrow(t).repartition(5),
            weights={"web": 3, "book": 1}, stop=stop,
            plan="bucket", rank_buckets=8)
            .to_pandas().sort_values("pos").reset_index(drop=True))
        assert list(got.columns) == list(want.columns) or \
            set(got.columns) == set(want.columns)
        got = got[want.columns.tolist()]
        assert got.equals(want), f"bucket plan diverged at stop={stop}"

    # empty input: both plans emit nothing
    empty = pa.Table.from_pylist([], schema=t.schema)
    out = interleave_sources(rd.from_arrow(empty), weights={"web": 1},
                             stop="first_exhausted", plan="bucket",
                             rank_buckets=4).to_pandas()
    assert len(out) == 0


def test_substring_dedup_removes_shared_spans_any_offset():
    from textgraphs_ray.stages.dedup import substring_dedup

    span = " ".join(f"s{i}" for i in range(12))   # 12-token shared span
    pre = " ".join(f"p{i}" for i in range(5))     # different offsets
    ua = " ".join(f"a{i}" for i in range(11))
    ub = " ".join(f"b{i}" for i in range(9))   # < window: never a gram
    rows = [
        {"doc_id": 1, "text": f"{span} {ua}"},
        {"doc_id": 2, "text": f"{pre} {span} {ub}"},  # span at offset 5
        {"doc_id": 3, "text": ub},                    # < window, repeated
        {"doc_id": 4, "text": ""},
    ]
    out = (substring_dedup(rd.from_arrow(pa.Table.from_pylist(rows)),
                           window=10, min_count=2)
           .to_pandas().set_index("doc_id"))
    # the 12-token span is stripped from BOTH docs despite different
    # offsets (chunk_dedup's aligned windows would miss doc 2)
    assert out.loc[1, "text_dedup"] == ua
    assert out.loc[2, "text_dedup"] == f"{pre} {ub}"
    assert out.loc[1, "n_removed"] == 12 and out.loc[2, "n_removed"] == 12
    # repeats shorter than the window survive (doc 3 == doc 2 tail)
    assert out.loc[3, "text_dedup"] == ub
    assert out.loc[4, "n_tokens"] == 0


def test_substring_dedup_unique_corpus_identity():
    from textgraphs_ray.stages.dedup import substring_dedup

    rows = [{"doc_id": i, "text": " ".join(f"u{i}x{j}" for j in range(25))}
            for i in range(4)]
    out = (substring_dedup(rd.from_arrow(pa.Table.from_pylist(rows)))
           .to_pandas().set_index("doc_id"))
    for i in range(4):
        assert out.loc[i, "text_dedup"] == rows[i]["text"]
        assert out.loc[i, "n_removed"] == 0


def test_semantic_dedup_clusters_planted_copies():
    from textgraphs_ray.stages.dedup import semantic_dedup

    rng = np.random.RandomState(5)
    rows = []
    for i in range(40):
        rows.append({"vec_id": i, "embedding": rng.standard_normal(16)
                     .astype(np.float32).tolist()})
    base = rng.standard_normal(16).astype(np.float32)
    for j, vid in enumerate((200, 201, 202)):
        noisy = base + 0.005 * rng.standard_normal(16).astype(np.float32)
        rows.append({"vec_id": vid, "embedding": noisy.tolist()})
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = semantic_dedup(ds, cosine_threshold=0.98, ncells=4).to_pandas()
    cl = dict(zip(out["key"], out["cluster_id"]))
    assert cl["200"] == cl["201"] == cl["202"]
    assert cl["0"] != cl["200"]
    assert len(out) == 43

    # empty input yields a typed empty result, not a crash
    empty = rd.from_arrow(pa.schema(
        [("vec_id", pa.int64()),
         ("embedding", pa.list_(pa.float32()))]).empty_table())
    assert semantic_dedup(empty).count() == 0


def test_knn_self_join_exact_at_full_probe_and_recall():
    from textgraphs_ray.stages.similarity import knn_brute, knn_self_join

    rng = np.random.RandomState(11)
    emb = rng.standard_normal((80, 12)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(range(80), pa.int64()),
                  "embedding": [e.tolist() for e in emb]})
    ds = rd.from_arrow(t)
    exact = (knn_brute(ds, emb, k=4, exclude_self=True)
             .sort_values(["query_id", "rank"]).reset_index(drop=True))
    full = (knn_self_join(ds, k=4, ncells=5, nprobe=5).to_pandas()
            .sort_values(["query_id", "rank"]).reset_index(drop=True))
    # nprobe == ncells scans every member: exactly brute force
    assert list(full["vec_id"]) == list(exact["vec_id"])
    np.testing.assert_allclose(full["sim"], exact["sim"], rtol=1e-6)
    # partial probing keeps most neighbors
    part = knn_self_join(ds, k=4, ncells=5, nprobe=2).to_pandas()
    hits = len(part.merge(exact, on=["query_id", "vec_id"]))
    assert hits / len(exact) > 0.5
    # empty input: typed empty result
    empty = rd.from_arrow(pa.schema(
        [("vec_id", pa.int64()),
         ("embedding", pa.list_(pa.float32()))]).empty_table())
    assert knn_self_join(empty).count() == 0


def test_knn_self_join_hot_cell_cap():
    """A skewed corpus (one k-means cell holding ~90% of vectors) must
    split the hot cell into salted sub-cells: per-task member count is
    bounded by cell_cap (asserted inside the cell task) and the result
    at nprobe=ncells stays exactly brute force."""
    from textgraphs_ray.stages.similarity import knn_brute, knn_self_join

    rng = np.random.RandomState(5)
    # 90 near-identical vectors in one tight cluster + 10 spread out
    hot = (np.tile(np.eye(8, dtype=np.float32)[0], (90, 1))
           + 0.01 * rng.standard_normal((90, 8)).astype(np.float32))
    cold = rng.standard_normal((10, 8)).astype(np.float32)
    emb = np.vstack([hot, cold])
    t = pa.table({"vec_id": pa.array(range(100), pa.int64()),
                  "embedding": [e.tolist() for e in emb]})
    ds = rd.from_arrow(t)
    exact = (knn_brute(ds, emb, k=3, exclude_self=True)
             .sort_values(["query_id", "rank"]).reset_index(drop=True))
    # cell_cap far below the hot cell's ~90 members forces >1 sub-cell;
    # the in-task assert enforces the bound, equality checks recall
    capped = (knn_self_join(ds, k=3, ncells=4, nprobe=4, cell_cap=16)
              .to_pandas()
              .sort_values(["query_id", "rank"]).reset_index(drop=True))
    assert list(capped["vec_id"]) == list(exact["vec_id"])
    np.testing.assert_allclose(capped["sim"], exact["sim"], rtol=1e-6)


def test_rebel_generator_wiring():
    """The real-model mREBEL kernel: registry gate matches the
    transformers import; an injected generator drives the seq2seq
    linearization through parse_rebel_triplets with rel->IRI
    resolution (wiki80 cache hit + mrebel: literal fallback)."""
    import pyarrow as pa

    from textgraphs_ray.registry import registry
    from textgraphs_ray.stages.relations import (HAVE_TRANSFORMERS,
                                                 RebelGenerator)

    assert ("mrebel" in registry.inferrers) == HAVE_TRANSFORMERS
    if not HAVE_TRANSFORMERS:
        with pytest.raises(ImportError):
            RebelGenerator()

    def fake_generate(texts):
        assert texts == ["Herzog was born in Munich.", ""]
        return ["<s><triplet> Werner Herzog <per> Munich <loc> "
                "place of birth </s>", ""]

    batch = pa.table({"doc_id": ["d0", "d1"],
                      "text": ["Herzog was born in Munich.", ""]})
    out = RebelGenerator(generator=fake_generate)(batch)
    rows = out.to_pylist()
    assert len(rows) == 1
    assert rows[0]["doc_id"] == "d0"
    assert rows[0]["head"] == "Werner Herzog"
    assert rows[0]["head_type"] == "per"
    assert rows[0]["tail"] == "Munich"
    assert rows[0]["tail_type"] == "loc"
    assert rows[0]["rel"] == "place of birth"
    # wiki80-cache hit -> canonical Wikidata property IRI
    assert rows[0]["iri"] == "http://www.wikidata.org/prop/direct/P19"

    def unknown_rel(texts):
        return ["<triplet> A <x> B <y> made up rel"] * len(texts)

    out2 = RebelGenerator(generator=unknown_rel)(
        pa.table({"doc_id": ["d2"], "text": ["ab"]}))
    assert out2.to_pylist()[0]["iri"] == "mrebel:made_up_rel"


def test_rebel_decode_keeps_marker_tokens():
    """The real-model decode path (make_rebel_decode) must batch_decode
    RAW token ids with special tokens KEPT: a fake HF pipeline whose
    tokenizer vocabulary includes the <triplet>/<per>/<loc> markers
    round-trips them to parse_rebel_triplets and yields a triple.  The
    broken default (pipeline text output = skip_special_tokens=True)
    would strip the markers and parse zero triples — both shapes are
    pinned here."""
    import pyarrow as pa

    from textgraphs_ray.stages.relations import (RebelGenerator,
                                                 make_rebel_decode,
                                                 parse_rebel_triplets)

    # id→token table for a miniature mREBEL-style vocabulary
    vocab = {0: "<s>", 1: "</s>", 2: "<triplet>", 3: "<per>",
             4: "<loc>", 10: "Werner Herzog", 11: "Munich",
             12: "place of birth"}
    special = {0, 1, 2, 3, 4}

    class FakeTokenizer:
        def batch_decode(self, ids_batch, skip_special_tokens=False):
            return [" ".join(vocab[i] for i in ids
                             if not (skip_special_tokens
                                     and i in special))
                    for ids in ids_batch]

    class FakePipe:
        tokenizer = FakeTokenizer()

        def __call__(self, texts, **kwargs):
            # the reference decode contract (rel.py:145-171)
            assert kwargs.get("return_tensors") is True
            assert kwargs.get("return_text") is False
            assert kwargs.get("decoder_start_token_id") == 250058
            assert kwargs.get("tgt_lang") == "<triplet>"
            ids = [0, 2, 10, 3, 11, 4, 12, 1]
            return [{"translation_token_ids": ids} for _ in texts]

    decode = make_rebel_decode(FakePipe())
    decoded = decode(["Herzog was born in Munich."])
    assert "<triplet>" in decoded[0]          # markers survived
    trips = parse_rebel_triplets(decoded[0])
    assert trips == [{"head": "Werner Herzog", "head_type": "per",
                      "tail": "Munich", "tail_type": "loc",
                      "type": "place of birth"}]

    # and through the full stage: non-zero triples end to end
    out = RebelGenerator(generator=decode)(
        pa.table({"doc_id": ["d0"],
                  "text": ["Herzog was born in Munich."]}))
    assert out.num_rows == 1

    # the failure mode this guards: skip_special_tokens strips the
    # markers and the SAME ids parse to zero triples
    stripped = FakeTokenizer().batch_decode(
        [[0, 2, 10, 3, 11, 4, 12, 1]], skip_special_tokens=True)
    assert parse_rebel_triplets(stripped[0]) == []


def test_mixture_sample_rates():
    """α-sampling: skewed sources rebalance toward n_s^α; clamped rates
    keep every row of tiny sources; selection is deterministic."""
    from textgraphs_ray.stages.sampling import mixture_sample

    rows = ([{"doc_id": i, "source": "big"} for i in range(400)]
            + [{"doc_id": 1000 + i, "source": "small"} for i in range(16)])
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = mixture_sample(ds, alpha=0.5, target_frac=0.5,
                         source_col="source", id_col="doc_id").to_pandas()
    # rates: z = 20 + 4 = 24; r_big = .5*416/sqrt(400)/24 = 0.4333…,
    # r_small = .5*416*16^-.5/24 = 2.1667 → clamps to 1.0
    assert (out[out["source"] == "small"].shape[0] == 16)
    frac_big = (out["source"] == "big").sum() / 400
    assert 0.3 < frac_big < 0.55  # md5 variate ≈ uniform
    again = mixture_sample(ds, alpha=0.5, target_frac=0.5,
                           source_col="source",
                           id_col="doc_id").to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        again.sort_values("doc_id").reset_index(drop=True))


def test_weighted_sample():
    """A-ES: heavy-weight rows dominate the sample; k > N returns all
    positive-weight rows; selection is deterministic."""
    from textgraphs_ray.stages.sampling import weighted_sample

    rows = ([{"doc_id": i, "w": 200} for i in range(100)]
            + [{"doc_id": 1000 + i, "w": 2} for i in range(100)]
            + [{"doc_id": 9999, "w": 0}])          # excluded
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = weighted_sample(ds, k=20, weight_col="w").to_pandas()
    assert len(out) == 20
    assert (out["doc_id"] < 1000).sum() >= 15      # heavy rows dominate
    assert (out["score"] <= 0).all()
    allrows = weighted_sample(ds, k=500, weight_col="w").to_pandas()
    assert len(allrows) == 200                     # w=0 row excluded
    again = weighted_sample(ds, k=20, weight_col="w").to_pandas()
    pd.testing.assert_frame_equal(out, again)


def test_audio_spectrogram_sine_dominant_bin():
    """A pure sine at bin-k frequency must dominate every frame's
    spectrum; silence stays at the log floor; frame count follows the
    (len - frame_len) // hop + 1 formula; output is split-invariant."""
    import numpy as np

    from textgraphs_ray.functions.imaging import encode_wav_pcm16
    from textgraphs_ray.stages.media import AudioSpectrogram

    rate, frame_len, hop = 16000, 256, 128
    k = 20                                  # target rFFT bin
    n = frame_len * 8
    t = np.arange(n)
    sine = (10000 * np.sin(2 * np.pi * k * t / frame_len)).astype(
        np.int16)
    silence = np.zeros(n, np.int16)
    tbl = pa.table({
        "media_ref": pa.array(["sine", "quiet"], pa.string()),
        "media_type": pa.array(["audio", "audio"], pa.string()),
        "payload": pa.array([encode_wav_pcm16(sine, rate),
                             encode_wav_pcm16(silence, rate)],
                            pa.binary())})
    out = AudioSpectrogram(frame_len=frame_len, hop=hop)(tbl)
    df = out.to_pandas()
    sine_rows = df[df["media_ref"] == "sine"]
    want_frames = (n - frame_len) // hop + 1
    assert len(sine_rows) == want_frames
    assert (sine_rows["dom_bin"] == k).all()
    quiet = df[df["media_ref"] == "quiet"]
    q_bands = np.stack(quiet["bands"].to_numpy())
    assert (q_bands <= -9.9).all()          # log10(1e-10) floor
    s_bands = np.stack(sine_rows["bands"].to_numpy())
    assert s_bands.max() > q_bands.max() + 5

    # split-invariance: one row per batch gives identical rows
    parts = [AudioSpectrogram(frame_len=frame_len, hop=hop)(
        tbl.slice(i, 1)) for i in range(2)]
    merged = pa.concat_tables(parts).to_pandas()
    pd.testing.assert_frame_equal(
        df.reset_index(drop=True), merged.reset_index(drop=True))


def test_audio_spectrogram_skips_non_audio():
    from textgraphs_ray.stages.media import AudioSpectrogram

    tbl = pa.table({
        "media_ref": pa.array(["x"], pa.string()),
        "media_type": pa.array(["image"], pa.string()),
        "payload": pa.array([b"P6 not audio"], pa.binary())})
    out = AudioSpectrogram()(tbl)
    assert out.num_rows == 0
    assert out.schema.names == ["media_ref", "frame_idx", "dom_bin",
                                "bands"]
