"""Native (C++) IO tier: ctypes bindings over ``io_native.cpp``.

The reference does all IO in Python (reference dca/io.py:53-129, pandas/
scanpy); at 1.3M-cell scale TSV parsing and the %.6f TSV write dominate
wall time, so this tier provides OpenMP-parallel C++ hot loops:

  * :func:`parse_text_matrix` — TSV/CSV count-matrix reader (mmap + parallel
    strtof), semantics-equal to ``pd.read_csv(sep, index_col=0)``
  * :func:`format_matrix` — ``%.6f`` row formatting, byte-identical to
    ``DataFrame.to_csv(float_format='%.6f')``
  * :func:`densify_rows` / :func:`gather_rows` — CSR scatter / dense gather
    for the streaming batch pipeline (data/loader.py)

The shared library is built on demand with ``g++ -O3 -fopenmp -shared``
(no pybind11 — plain C ABI via ctypes).  Every entry point has a pure
numpy/pandas fallback; ``available()`` reports whether the native path is
active.  Set ``DCA_TPU_NO_NATIVE=1`` to force the fallbacks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import tempfile

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "io_native.cpp")
_LIB_PATH = os.path.join(_HERE, "_io_native.so")

_lib = None
_tried = False


def _build():
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-o", _LIB_PATH, _SRC,
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=120)
        if r.returncode != 0:
            # retry without -march=native (unsupported on some toolchains)
            cmd.remove("-march=native")
            r = subprocess.run(cmd, capture_output=True, timeout=120)
        return r.returncode == 0
    except (OSError, subprocess.TimeoutExpired):
        return False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("DCA_TPU_NO_NATIVE"):
        return None
    try:
        stale = (not os.path.exists(_LIB_PATH)) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
        )
        if stale and not _build():
            return None
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    c_char_p = ctypes.c_char_p
    i64 = ctypes.c_int64
    p_i64 = ctypes.POINTER(ctypes.c_int64)
    p_i32 = ctypes.POINTER(ctypes.c_int32)
    p_f32 = ctypes.POINTER(ctypes.c_float)

    lib.dca_count_lines.restype = i64
    lib.dca_count_lines.argtypes = [c_char_p, i64]
    lib.dca_index_lines.restype = i64
    lib.dca_index_lines.argtypes = [c_char_p, i64, p_i64, i64]
    lib.dca_count_fields.restype = i64
    lib.dca_count_fields.argtypes = [c_char_p, i64, i64, ctypes.c_char]
    lib.dca_parse_rows.restype = i64
    lib.dca_parse_rows.argtypes = [
        c_char_p, i64, p_i64, i64, i64, ctypes.c_int, ctypes.c_char,
        p_f32, p_i64, p_i64,
    ]
    lib.dca_csr_densify.restype = None
    lib.dca_csr_densify.argtypes = [p_i64, p_i32, p_f32, p_i64, i64, i64, p_f32]
    lib.dca_csr_to_padded.restype = None
    lib.dca_csr_to_padded.argtypes = [
        p_i64, p_i32, p_f32, p_i64, i64, i64, ctypes.c_int32, p_i32, p_f32,
    ]
    lib.dca_csr_to_flat.restype = i64
    lib.dca_csr_to_flat.argtypes = [
        p_i64, p_i32, p_f32, p_i64, i64, i64, ctypes.c_int32,
        p_i32, p_i32, p_f32,
    ]
    lib.dca_gather_rows.restype = None
    lib.dca_gather_rows.argtypes = [p_f32, p_i64, i64, i64, p_f32]
    lib.dca_format_rows.restype = i64
    lib.dca_format_rows.argtypes = [
        p_f32, i64, i64, c_char_p, p_i64, p_i64, ctypes.c_char, c_char_p, i64,
    ]
    lib.dca_write_file.restype = i64
    lib.dca_write_file.argtypes = [
        c_char_p, c_char_p, i64, p_f32, i64, i64, c_char_p, p_i64, p_i64,
        ctypes.c_char,
    ]
    lib.dca_native_threads.restype = ctypes.c_int
    lib.dca_native_threads.argtypes = []
    lib.dca_native_set_threads.restype = None
    lib.dca_native_set_threads.argtypes = [ctypes.c_int]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def n_threads() -> int:
    lib = _load()
    return lib.dca_native_threads() if lib else 1


def set_threads(n) -> None:
    """Cap the native tier's OpenMP pool (the `threads` CLI/API option —
    reference train.py:41-48 does the same to TF's thread pools).  No-op
    when the native library is unavailable or n is falsy."""
    lib = _load()
    if lib is not None and n:
        lib.dca_native_set_threads(int(n))


def _as_i64(a):
    return np.ascontiguousarray(a, dtype=np.int64)


def _ptr(a, typ):
    return a.ctypes.data_as(typ)


# ---------------------------------------------------------------------------
# text matrix parse
# ---------------------------------------------------------------------------


def parse_text_matrix(path_or_bytes, sep="\t", first_column_names=True):
    """Parse a delimited numeric matrix with a header line.

    Returns ``(X float32 (rows, cols), rownames list[str] | None,
    colnames list[str])`` with the same semantics as
    ``pd.read_csv(sep=sep, index_col=0 if first_column_names else None)``.
    Returns None if the native library is unavailable (caller falls back).
    """
    lib = _load()
    if lib is None:
        return None

    if isinstance(path_or_bytes, bytes):
        buf = path_or_bytes
    else:
        p = str(path_or_bytes)
        if p.endswith(".gz"):
            import gzip

            with gzip.open(p, "rb") as f:
                buf = f.read()
        else:
            with open(p, "rb") as f:
                buf = f.read()
    blen = len(buf)
    if blen == 0:
        return None

    n_lines = lib.dca_count_lines(buf, blen)
    if n_lines < 2:
        return None
    starts = np.empty(n_lines, np.int64)
    got = lib.dca_index_lines(buf, blen, _ptr(starts, lib.dca_index_lines.argtypes[2]), n_lines)
    if got != n_lines:
        return None

    sep_b = sep.encode()
    header_fields = lib.dca_count_fields(buf, blen, starts[0], sep_b)
    data_fields = lib.dca_count_fields(buf, blen, starts[1], sep_b)

    n_rows = n_lines - 1
    skip_first = 1 if first_column_names else 0
    cols = data_fields - skip_first
    if cols <= 0:
        return None
    # header may or may not carry the corner cell; pandas keeps the LAST
    # `cols` header fields as column names either way
    header_end = int(starts[1]) - 1
    while header_end > 0 and buf[header_end - 1 : header_end] in (b"\n", b"\r"):
        header_end -= 1
    header = buf[int(starts[0]) : header_end].decode("utf-8", "replace")
    hfields = header.split(sep)
    if header_fields not in (cols, cols + skip_first):
        return None  # ragged header: let pandas produce its usual behavior
    colnames = hfields[-cols:]

    X = np.empty((n_rows, cols), np.float32)
    if skip_first:
        name_off = np.empty(n_rows, np.int64)
        name_len = np.empty(n_rows, np.int64)
        no_p = _ptr(name_off, lib.dca_parse_rows.argtypes[8])
        nl_p = _ptr(name_len, lib.dca_parse_rows.argtypes[9])
    else:
        name_off = name_len = None
        no_p = nl_p = None

    data_starts = np.ascontiguousarray(starts[1:])
    bad = lib.dca_parse_rows(
        buf, blen,
        _ptr(data_starts, lib.dca_parse_rows.argtypes[2]),
        n_rows, cols, skip_first, sep_b,
        _ptr(X, lib.dca_parse_rows.argtypes[7]),
        no_p, nl_p,
    )
    if bad != 0:
        return None  # malformed row: fall back to pandas for the error path

    rownames = None
    if skip_first:
        rownames = [
            buf[int(o) : int(o + l)].decode("utf-8", "replace")
            for o, l in zip(name_off, name_len)
        ]
    return X, rownames, colnames


# ---------------------------------------------------------------------------
# text matrix format/write
# ---------------------------------------------------------------------------


def _name_spans(rownames):
    encoded = [str(r).encode() for r in rownames]
    blob = b"".join(encoded)
    name_len = np.array([len(e) for e in encoded], np.int64)
    name_off = np.concatenate([[0], np.cumsum(name_len[:-1])]).astype(np.int64)
    return blob, name_off, name_len


def _header_bytes(rownames, colnames, sep):
    if colnames is None:
        return b""
    head = (sep if rownames is not None else "") + sep.join(
        str(c) for c in colnames
    ) + "\n"
    return head.encode()


def format_matrix(matrix, rownames=None, colnames=None, sep="\t"):
    """Format a matrix as delimited text bytes, byte-identical to
    ``pd.DataFrame(...).to_csv(sep=sep, float_format='%.6f',
    index=rownames is not None, header=colnames is not None)``.
    Returns None if native is unavailable."""
    lib = _load()
    if lib is None:
        return None
    X = np.ascontiguousarray(matrix, dtype=np.float32)
    n_rows, n_cols = X.shape
    sep_b = sep.encode()

    if rownames is not None:
        blob, name_off, name_len = _name_spans(rownames)
        no_p = _ptr(name_off, lib.dca_format_rows.argtypes[4])
        nl_p = _ptr(name_len, lib.dca_format_rows.argtypes[5])
        name_bytes = int(name_len.sum())
    else:
        blob = b""
        no_p = nl_p = None
        name_bytes = 0

    cap = n_rows * (n_cols * 49 + 2) + name_bytes + n_rows * 2 + 64
    # numpy-backed buffer, NOT a ctypes array: glibc reliably munmaps
    # numpy's large allocations, while multi-GB `(c_char * cap)()` arrays
    # interleaved with other allocations were measured to stay RESIDENT
    # after del — the round-5 50k x 28k TSV write accumulated one ~6 GB
    # worst-case buffer per gene strip until the OOM killer fired at
    # 130 GB anon RSS (docs/benchmarks.md round 5)
    out = np.empty(cap, np.uint8)
    written = lib.dca_format_rows(
        _ptr(X, lib.dca_format_rows.argtypes[0]),
        n_rows, n_cols, blob, no_p, nl_p, sep_b,
        out.ctypes.data_as(ctypes.c_char_p), cap,
    )
    if written < 0:
        return None
    return _header_bytes(rownames, colnames, sep) + out[:written].tobytes()


def write_matrix(matrix, filename, rownames=None, colnames=None, sep="\t"):
    """Native fast path for io.write_text_matrix: formats + writes straight
    from C in bounded row blocks.  Returns False on fallback."""
    lib = _load()
    if lib is None:
        return False
    X = np.ascontiguousarray(matrix, dtype=np.float32)
    n_rows, n_cols = X.shape
    if rownames is not None:
        blob, name_off, name_len = _name_spans(rownames)
        no_p = _ptr(name_off, lib.dca_write_file.argtypes[7])
        nl_p = _ptr(name_len, lib.dca_write_file.argtypes[8])
    else:
        blob = b""
        no_p = nl_p = None
    header = _header_bytes(rownames, colnames, sep)

    d = os.path.dirname(os.path.abspath(filename))
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    os.close(fd)
    written = lib.dca_write_file(
        tmp.encode(), header, len(header),
        _ptr(X, lib.dca_write_file.argtypes[3]),
        n_rows, n_cols, blob, no_p, nl_p, sep.encode(),
    )
    if written < 0:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False
    os.replace(tmp, filename)
    return True


# ---------------------------------------------------------------------------
# batch assembly
# ---------------------------------------------------------------------------


def densify_rows(indptr, indices, data, rows, n_cols, out=None):
    """Scatter CSR rows into a dense (len(rows), n_cols) f32 array."""
    lib = _load()
    rows = _as_i64(rows)
    n_rows = len(rows)
    if out is None:
        out = np.empty((n_rows, n_cols), np.float32)
    if lib is None:
        out[:] = 0.0
        for r, src in enumerate(rows):
            sl = slice(indptr[src], indptr[src + 1])
            out[r, indices[sl]] = data[sl]
        return out
    indptr = _as_i64(indptr)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    data = np.ascontiguousarray(data, dtype=np.float32)
    lib.dca_csr_densify(
        _ptr(indptr, lib.dca_csr_densify.argtypes[0]),
        _ptr(indices, lib.dca_csr_densify.argtypes[1]),
        _ptr(data, lib.dca_csr_densify.argtypes[2]),
        _ptr(rows, lib.dca_csr_densify.argtypes[3]),
        n_rows, n_cols,
        _ptr(out, lib.dca_csr_densify.argtypes[6]),
    )
    return out


def csr_to_padded(indptr, indices, data, rows, K, pad_index):
    """Copy CSR rows into padded (len(rows), K) int32/f32 payload buffers for
    on-device densification (ops/densify.py): index slots past a row's nnz
    carry ascending out-of-range ids ``pad_index + k`` (keeps the device
    scatter's sorted/unique hints true), value slots carry 0."""
    rows = _as_i64(rows)
    n_rows = len(rows)
    out_idx = np.empty((n_rows, K), np.int32)
    out_dat = np.empty((n_rows, K), np.float32)
    lib = _load()
    if lib is None:
        indptr = _as_i64(indptr)
        out_dat[:] = 0.0
        starts = indptr[rows]
        lens = np.minimum(indptr[rows + 1] - starts, K)
        # padding slot k of a row with L entries carries pad_index + (k - L)
        pad_shift = np.arange(K, dtype=np.int32)[None, :] - lens[:, None]
        out_idx[:] = pad_index + np.maximum(pad_shift, 0).astype(np.int32)
        total = int(lens.sum())
        if total:
            rr = np.repeat(np.arange(n_rows), lens)
            jj = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
            src = np.repeat(starts, lens) + jj
            out_idx[rr, jj] = indices[src]
            out_dat[rr, jj] = data[src]
        return out_idx, out_dat
    indptr = _as_i64(indptr)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    data = np.ascontiguousarray(data, dtype=np.float32)
    lib.dca_csr_to_padded(
        _ptr(indptr, lib.dca_csr_to_padded.argtypes[0]),
        _ptr(indices, lib.dca_csr_to_padded.argtypes[1]),
        _ptr(data, lib.dca_csr_to_padded.argtypes[2]),
        _ptr(rows, lib.dca_csr_to_padded.argtypes[3]),
        n_rows, K, np.int32(pad_index),
        _ptr(out_idx, lib.dca_csr_to_padded.argtypes[7]),
        _ptr(out_dat, lib.dca_csr_to_padded.argtypes[8]),
    )
    return out_idx, out_dat


def csr_to_flat(indptr, indices, data, rows, L, pad_row):
    """Copy CSR rows into a FLAT padded COO payload (row, col, val) of
    length ``L`` for the on-device flat scatter (ops/densify.py) — 12 bytes
    per nonzero vs the padded scheme's 8 bytes per max-width slot; wins on
    heavy-tailed row-nnz distributions.  Padding slots carry row id
    ``pad_row`` (out of bounds, dropped by the scatter).

    Returns (row_ids, col_ids, values, total_nnz); total_nnz > L means the
    payload did not fit (caller picks a bigger bucket)."""
    rows = _as_i64(rows)
    n_rows = len(rows)
    out_row = np.empty(L, np.int32)
    out_col = np.empty(L, np.int32)
    out_val = np.empty(L, np.float32)
    lib = _load()
    if lib is None:
        indptr = _as_i64(indptr)
        starts = indptr[rows]
        lens = indptr[rows + 1] - starts
        total = int(lens.sum())
        if total > L:
            return out_row, out_col, out_val, total
        rr = np.repeat(np.arange(n_rows, dtype=np.int32), lens)
        jj = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
        src = np.repeat(starts, lens) + jj
        out_row[:total] = rr
        out_col[:total] = np.asarray(indices)[src]
        out_val[:total] = np.asarray(data)[src]
        out_row[total:] = pad_row
        out_col[total:] = 0
        out_val[total:] = 0.0
        return out_row, out_col, out_val, total
    indptr = _as_i64(indptr)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    data = np.ascontiguousarray(data, dtype=np.float32)
    total = lib.dca_csr_to_flat(
        _ptr(indptr, lib.dca_csr_to_flat.argtypes[0]),
        _ptr(indices, lib.dca_csr_to_flat.argtypes[1]),
        _ptr(data, lib.dca_csr_to_flat.argtypes[2]),
        _ptr(rows, lib.dca_csr_to_flat.argtypes[3]),
        n_rows, L, np.int32(pad_row),
        _ptr(out_row, lib.dca_csr_to_flat.argtypes[7]),
        _ptr(out_col, lib.dca_csr_to_flat.argtypes[8]),
        _ptr(out_val, lib.dca_csr_to_flat.argtypes[9]),
    )
    return out_row, out_col, out_val, int(total)


def gather_rows(src, rows, out=None):
    """Dense fancy-index row gather: out = src[rows] (f32, parallel)."""
    lib = _load()
    rows = _as_i64(rows)
    if lib is None or not (
        isinstance(src, np.ndarray) and src.dtype == np.float32 and src.flags.c_contiguous
    ):
        r = np.asarray(src)[rows]
        return np.ascontiguousarray(r, dtype=np.float32)
    n_rows = len(rows)
    n_cols = src.shape[1]
    if out is None:
        out = np.empty((n_rows, n_cols), np.float32)
    lib.dca_gather_rows(
        _ptr(src, lib.dca_gather_rows.argtypes[0]),
        _ptr(rows, lib.dca_gather_rows.argtypes[1]),
        n_rows, n_cols,
        _ptr(out, lib.dca_gather_rows.argtypes[4]),
    )
    return out
