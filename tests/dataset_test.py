import numpy as np
import pytest

import vaex_tpu as vaex
from vaex_tpu.dataset import DatasetArrays


def test_dataset_basics():
    ds = DatasetArrays(dict(x=np.arange(5), y=np.arange(5) * 2.0))
    assert ds.row_count == 5
    assert set(ds) == {"x", "y"}
    assert ds.data_type("y").numpy == np.float64


def test_chunk_iterator():
    ds = DatasetArrays(dict(x=np.arange(10)))
    chunks = list(ds.chunk_iterator(["x"], chunk_size=3))
    assert [(i1, i2) for i1, i2, _ in chunks] == [(0, 3), (3, 6), (6, 9), (9, 10)]
    assert np.concatenate([c["x"] for _, _, c in chunks]).tolist() == list(range(10))


def test_dataset_decorators():
    ds = DatasetArrays(dict(x=np.arange(10), y=np.arange(10) * 2))
    renamed = ds.renamed({"x": "a"})
    assert set(renamed) == {"a", "y"}
    sliced = ds.sliced(2, 5)
    assert sliced.row_count == 3
    chunks = list(sliced.chunk_iterator(["x"], chunk_size=2))
    assert np.concatenate([c["x"] for _, _, c in chunks]).tolist() == [2, 3, 4]
    taken = ds.take(np.array([1, 3, 5]))
    assert list(taken["x"][0:3]) == [1, 3, 5]
    dropped = ds.dropped("y")
    assert set(dropped) == {"x"}
    concat = ds.concat(ds)
    assert concat.row_count == 20
    chunks = list(concat.chunk_iterator(["x"], chunk_size=8))
    total = np.concatenate([c["x"] for _, _, c in chunks])
    assert total.tolist() == list(range(10)) + list(range(10))


def test_fingerprints_stable():
    ds1 = DatasetArrays(dict(x=np.arange(5)))
    ds2 = DatasetArrays(dict(x=np.arange(5)))
    ds3 = DatasetArrays(dict(x=np.arange(6)))
    assert ds1.fingerprint == ds2.fingerprint
    assert ds1.fingerprint != ds3.fingerprint


def test_merged():
    ds1 = DatasetArrays(dict(x=np.arange(5)))
    ds2 = DatasetArrays(dict(y=np.arange(5) * 2))
    m = ds1.merged(ds2)
    assert set(m) == {"x", "y"}
    chunks = list(m.chunk_iterator(["x", "y"], chunk_size=2))
    assert len(chunks) == 3


def test_column_sparse():
    """ColumnSparse: scipy csr matrix columns flow through stats, slicing,
    groupby and export (reference: column.py:147, dataframe.py:3516-3528)."""
    from scipy.sparse import csr_matrix
    df = vaex.from_arrays(x=np.arange(6.0))
    mat = csr_matrix(np.array([[1, 0], [0, 2], [3, 0], [0, 0], [5, 0], [0, 6]],
                              dtype=np.float64))
    df.add_columns(["a", "b"], mat)
    np.testing.assert_array_equal(np.asarray(df["a"].to_numpy()), [1, 0, 3, 0, 5, 0])
    assert float(df.sum("a")) == 9.0
    assert float(df.mean("b")) == pytest.approx(8 / 6)
    np.testing.assert_array_equal(np.asarray(df[1:5]["a"].to_numpy()), [0, 3, 0, 5])
    g = df.groupby("b", agg="count", sort=True)
    assert np.asarray(g["count"].to_numpy()).tolist() == [4, 1, 1]
    with pytest.raises(ValueError):
        df.add_columns(["only_one_name"], mat)
    # fingerprints distinguish content and column index
    from vaex_tpu.column import ColumnSparse
    assert ColumnSparse(mat, 0).fingerprint() != ColumnSparse(mat, 1).fingerprint()
    assert ColumnSparse(mat, 0).fingerprint() == ColumnSparse(mat.copy(), 0).fingerprint()
