"""stages/similarity.py PQ family: codebook training, encode shape,
ADC math identity (PQ similarity == exact similarity of reconstructed
vectors), recall vs brute force on clustered data, and edge cases."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from textgraphs_ray.stages.similarity import (_normalize, _pq_codes,
                                              knn_brute, knn_pq, pq_encode,
                                              pq_train)


def _clustered(n: int, d: int = 64, ncl: int = 40, seed: int = 5):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(ncl, d)).astype(np.float32)
    assign = rng.integers(0, ncl, n)
    pts = centers[assign] + 0.05 * rng.normal(size=(n, d)).astype(np.float32)
    return pts.astype(np.float32), centers


def _ds(vecs: np.ndarray) -> "rd.Dataset":
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
        "embedding": pa.array(list(vecs)),
    })).repartition(4)


class TestPQ:
    def test_train_and_encode_shapes(self):
        vecs, _ = _clustered(500)
        books = pq_train(vecs, m_sub=8, n_centroids=32)
        assert books.shape == (8, 32, 8)
        codes = _pq_codes(_normalize(vecs), books)
        assert codes.shape == (500, 8) and codes.dtype == np.uint8
        assert codes.max() < 32

    def test_train_rejects_indivisible_dims(self):
        import pytest

        with pytest.raises(ValueError):
            pq_train(np.ones((10, 10), np.float32), m_sub=3)

    def test_encode_appends_code_column(self):
        vecs, _ = _clustered(200)
        books = pq_train(vecs, m_sub=8, n_centroids=16)
        out = pq_encode(_ds(vecs), books).to_pandas()
        assert len(out) == 200
        assert all(len(c) == 8 for c in out["pq_code"])

    def test_adc_matches_reconstructed_similarity(self):
        """The returned PQ sim must equal the EXACT cosine of the query
        against the decoded (reconstructed) vector — validates the
        lookup-table math end to end."""
        vecs, centers = _clustered(300)
        queries = centers[:4]
        got = knn_pq(_ds(vecs), queries, k=300, m_sub=8, n_centroids=16,
                     sample_size=300)
        books = pq_train(
            vecs[:300], m_sub=8, n_centroids=16)
        codes = _pq_codes(_normalize(vecs), books)
        recon = np.concatenate(
            [books[j][codes[:, j]] for j in range(8)], axis=1)
        qn = _normalize(queries.astype(np.float32))
        exact = qn @ recon.T  # (Q, N)
        for qi in range(4):
            sub = got[got["query_id"] == qi]
            want = np.sort(exact[qi])[::-1][:len(sub)]
            np.testing.assert_allclose(
                np.sort(sub["sim"].to_numpy())[::-1], want, atol=1e-4)

    def test_neighbors_come_from_the_query_cluster(self):
        """On well-separated clusters PQ can't resolve WITHIN-cluster
        ordering (nearby points quantize to identical codes — exact
        top-10 recall is meaningless there) but it must retrieve from
        the RIGHT cluster: that's the property ANN users rely on."""
        rng = np.random.default_rng(5)
        d, ncl = 64, 40
        centers = rng.normal(size=(ncl, d)).astype(np.float32)
        assign = rng.integers(0, ncl, 2000)
        vecs = (centers[assign]
                + 0.05 * rng.normal(size=(2000, d)).astype(np.float32))
        approx = knn_pq(_ds(vecs.astype(np.float32)), centers[:8], k=10,
                        m_sub=8, n_centroids=64)
        ok = sum(assign[int(v)] == qi
                 for qi, v in zip(approx["query_id"], approx["vec_id"]))
        assert ok / len(approx) >= 0.9

    def test_empty_and_small_inputs(self):
        vecs, centers = _clustered(3)
        out = knn_pq(_ds(vecs), centers[:2], k=10, m_sub=8, n_centroids=8)
        assert set(out["query_id"]) == {0, 1}
        assert len(out) == 6  # k clipped to N=3 rows per query
        empty = knn_pq(_ds(vecs), np.zeros((0, 64), np.float32), k=3)
        assert len(empty) == 0
