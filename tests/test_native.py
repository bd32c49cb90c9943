"""Native (C++) IO tier equivalence tests: the ctypes fast paths must be
byte/value-identical to the pandas/scipy fallbacks (reference semantics:
dca/io.py:53-129)."""

import gzip
import io as _io

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

from dca_tpu import native
from dca_tpu.data.io import read_text, write_text_matrix

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


def _rand_counts(rs, rows, cols):
    return rs.poisson(1.5, size=(rows, cols)).astype(np.float32)


def test_parse_matches_pandas_corner_header(tmp_path):
    rs = np.random.RandomState(0)
    X = rs.normal(size=(37, 11)).astype(np.float32)
    df = pd.DataFrame(
        X,
        index=[f"gene_{i}" for i in range(37)],
        columns=[f"cell{j}" for j in range(11)],
    )
    p = tmp_path / "m.tsv"
    df.to_csv(p, sep="\t")  # corner cell present (empty index name)

    out = native.parse_text_matrix(str(p), sep="\t", first_column_names=True)
    assert out is not None
    Xn, rn, cn = out
    ref = pd.read_csv(p, sep="\t", index_col=0)
    np.testing.assert_allclose(Xn, ref.to_numpy(np.float32), rtol=0, atol=0)
    assert rn == list(ref.index)
    assert cn == list(ref.columns)


def test_parse_matches_pandas_r_style_header(tmp_path):
    """R write.table-style: header has one fewer field than data rows."""
    rs = np.random.RandomState(1)
    X = _rand_counts(rs, 23, 7)
    p = tmp_path / "r.tsv"
    with open(p, "w") as f:
        f.write("\t".join(f"c{j}" for j in range(7)) + "\n")
        for i in range(23):
            f.write(f"g{i}\t" + "\t".join(str(int(v)) for v in X[i]) + "\n")

    out = native.parse_text_matrix(str(p), sep="\t", first_column_names=True)
    assert out is not None
    Xn, rn, cn = out
    np.testing.assert_array_equal(Xn, X)
    assert rn == [f"g{i}" for i in range(23)]
    assert cn == [f"c{j}" for j in range(7)]


def test_parse_csv_and_gz(tmp_path):
    rs = np.random.RandomState(2)
    X = _rand_counts(rs, 12, 5)
    df = pd.DataFrame(X, index=[f"r{i}" for i in range(12)],
                      columns=[f"c{j}" for j in range(5)])
    p = tmp_path / "m.csv.gz"
    buf = _io.StringIO()
    df.to_csv(buf)
    with gzip.open(p, "wt") as f:
        f.write(buf.getvalue())

    ad = read_text(p, first_column_names=True)
    np.testing.assert_array_equal(np.asarray(ad.X), X)
    assert list(ad.obs.index) == list(df.index)
    assert list(ad.var.index) == list(df.columns)


def test_parse_empty_field_yields_nan(tmp_path):
    p = tmp_path / "nan.tsv"
    with open(p, "w") as f:
        f.write("\tc0\tc1\n")
        f.write("r0\t1.5\t\n")
        f.write("r1\t\t2.0\n")
    out = native.parse_text_matrix(str(p), sep="\t", first_column_names=True)
    assert out is not None
    Xn, _, _ = out
    assert Xn[0, 0] == 1.5 and np.isnan(Xn[0, 1])
    assert np.isnan(Xn[1, 0]) and Xn[1, 1] == 2.0


def test_format_byte_identical_to_pandas(tmp_path):
    rs = np.random.RandomState(3)
    X = np.concatenate(
        [
            rs.normal(scale=100.0, size=(19, 6)),
            np.array([[0.0, -0.0, 1e-7, 123456.789, -5.5, 0.1234565]]),
        ]
    ).astype(np.float32)
    rownames = [f"row {i}" for i in range(20)]
    colnames = [f"col{j}" for j in range(6)]

    p_native = tmp_path / "native.tsv"
    ok = native.write_matrix(X, str(p_native), rownames, colnames)
    assert ok

    p_pd = tmp_path / "pandas.tsv"
    pd.DataFrame(X, index=rownames, columns=colnames).to_csv(
        p_pd, sep="\t", float_format="%.6f"
    )
    assert p_native.read_bytes() == p_pd.read_bytes()


@pytest.mark.parametrize("with_rows,with_cols", [(True, False), (False, True), (False, False)])
def test_format_header_index_combinations(tmp_path, with_rows, with_cols):
    rs = np.random.RandomState(4)
    X = rs.normal(size=(5, 3)).astype(np.float32)
    rn = [f"r{i}" for i in range(5)] if with_rows else None
    cn = [f"c{j}" for j in range(3)] if with_cols else None

    p_native = tmp_path / "n.tsv"
    write_text_matrix(X, str(p_native), rownames=rn, colnames=cn)
    p_pd = tmp_path / "p.tsv"
    pd.DataFrame(X, index=rn, columns=cn).to_csv(
        p_pd, sep="\t", float_format="%.6f",
        index=rn is not None, header=cn is not None,
    )
    assert p_native.read_bytes() == p_pd.read_bytes()


def test_write_text_matrix_transpose_roundtrip(tmp_path):
    rs = np.random.RandomState(5)
    X = rs.normal(size=(4, 9)).astype(np.float32)
    rn = [f"cell{i}" for i in range(4)]
    cn = [f"g{j}" for j in range(9)]
    p = tmp_path / "t.tsv"
    write_text_matrix(X, str(p), rownames=rn, colnames=cn, transpose=True)
    back = pd.read_csv(p, sep="\t", index_col=0)
    assert list(back.index) == cn
    assert list(back.columns) == rn
    np.testing.assert_allclose(back.to_numpy(), X.T, atol=5e-7)


def test_csr_densify_matches_scipy():
    rs = np.random.RandomState(6)
    dense = (rs.uniform(size=(50, 40)) < 0.1) * rs.poisson(3, size=(50, 40))
    csr = sp.csr_matrix(dense.astype(np.float32))
    rows = rs.permutation(50)[:17]
    out = native.densify_rows(csr.indptr, csr.indices, csr.data, rows, 40)
    np.testing.assert_array_equal(out, dense[rows].astype(np.float32))


def test_gather_rows_matches_numpy():
    rs = np.random.RandomState(7)
    X = rs.normal(size=(30, 13)).astype(np.float32)
    rows = rs.permutation(30)[:9]
    out = native.gather_rows(X, rows)
    np.testing.assert_array_equal(out, X[rows])


def test_loader_uses_native_csr(monkeypatch):
    from dca_tpu.data import loader
    from dca_tpu.data.loader import StreamingData

    rs = np.random.RandomState(8)
    dense = ((rs.uniform(size=(25, 12)) < 0.2) * rs.poisson(2, size=(25, 12))).astype(
        np.float32
    )
    csr = sp.csr_matrix(dense)
    del loader  # the loader resolves `native.densify_rows` per call
    # spy: the loader must actually route CSR batches through the C++ tier
    calls = []
    real = native.densify_rows
    monkeypatch.setattr(
        native, "densify_rows",
        lambda *a, **k: (calls.append(1), real(*a, **k))[1],
    )
    sd = StreamingData(csr, csr, np.ones(25, np.float32), chunk_cells=10)
    perm = rs.permutation(25)
    chunks = list(sd.epoch_chunks(perm))
    got = np.concatenate([c[0] for c in chunks])
    np.testing.assert_array_equal(got, dense[perm])
    assert calls, "native densify_rows was never invoked"


def test_set_threads_caps_pool():
    """`threads` option reaches the native OpenMP pool (reference caps TF's
    thread pools the same way, train.py:41-48)."""
    if not native.available():
        import pytest
        pytest.skip("native unavailable")
    before = native.n_threads()
    try:
        native.set_threads(1)
        assert native.n_threads() == 1
        native.set_threads(2)
        assert native.n_threads() == 2
    finally:
        native.set_threads(before)
    native.set_threads(None)  # no-op


def test_parse_rejects_extra_fields():
    """A ragged row with MORE fields than the header must not parse silently
    (pandas raises ParserError; the native path returns None to defer)."""
    if not native.available():
        import pytest
        pytest.skip("native unavailable")
    good = b"\tc0\tc1\ng0\t1\t2\ng1\t3\t4\n"
    assert native.parse_text_matrix(good) is not None
    ragged = b"\tc0\tc1\ng0\t1\t2\ng1\t3\t4\t5\n"
    assert native.parse_text_matrix(ragged) is None
