"""Zero-copy embedding ingestion (functions/vec.py)."""

import numpy as np
import pyarrow as pa
import pytest

from textgraphs_ray.functions.vec import embeddings_to_ndarray, ids_to_ndarray


def test_list_float32_roundtrip():
    rows = [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]
    col = pa.array(rows, pa.list_(pa.float32()))
    out = embeddings_to_ndarray(col)
    assert out.dtype == np.float32 and out.shape == (3, 2)
    np.testing.assert_array_equal(out, np.asarray(rows, np.float32))


def test_chunked_and_fixed_size_list():
    a = pa.chunked_array([
        pa.array([[1.0, 2.0]], pa.list_(pa.float64())),
        pa.array([[3.0, 4.0]], pa.list_(pa.float64())),
    ])
    out = embeddings_to_ndarray(a, dtype=np.float64)
    np.testing.assert_array_equal(out, [[1.0, 2.0], [3.0, 4.0]])
    f = pa.array([[1.0, 2.0], [3.0, 4.0]],
                 pa.list_(pa.float32(), 2))  # fixed_size_list
    np.testing.assert_array_equal(embeddings_to_ndarray(f),
                                  [[1.0, 2.0], [3.0, 4.0]])


def test_sliced_column_respects_offsets():
    col = pa.array([[1.0, 1.0], [2.0, 2.0], [3.0, 3.0]],
                   pa.list_(pa.float32()))
    out = embeddings_to_ndarray(col.slice(1, 2))
    np.testing.assert_array_equal(out, [[2.0, 2.0], [3.0, 3.0]])


def test_empty_and_errors():
    assert embeddings_to_ndarray(
        pa.array([], pa.list_(pa.float32()))).shape == (0, 0)
    with pytest.raises(ValueError):
        embeddings_to_ndarray(pa.array([[1.0], [1.0, 2.0], [1.0, 2.0]],
                                       pa.list_(pa.float32())))
    with pytest.raises(ValueError):
        embeddings_to_ndarray(pa.array([[1.0, 2.0], None],
                                       pa.list_(pa.float32())))
    # ragged but total-length-divisible: 1+3 values over 2 rows
    with pytest.raises(ValueError):
        embeddings_to_ndarray(pa.array([[1.0], [1.0, 2.0, 3.0]],
                                       pa.list_(pa.float32())))


def test_ids_to_ndarray():
    np.testing.assert_array_equal(
        ids_to_ndarray(pa.chunked_array([pa.array([1, 2]), pa.array([3])])),
        [1, 2, 3])
    assert list(ids_to_ndarray(pa.array(["a", "b"]))) == ["a", "b"]
