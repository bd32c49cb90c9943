"""Device-resident corpus staging for the streaming trainer.

When the COMPRESSED corpus payload fits in HBM, per-epoch host->device
transfer disappears entirely: the raw-count CSR components upload ONCE
(int16 columns + uint16 values ~= 4 bytes/nonzero) and every shuffled
part's dense (B, G) input/target pair is rebuilt ON DEVICE — a row
gather into the padded (B, K) payload layout followed by the exact
scatter the wire path uses (ops/densify._scatter_impl), with the
ship-one-payload input derive (x = (log1p(t * m_r) - mu) / sd,
train/loop.py) fused into the same program.  Per epoch only the
shuffled row ids (~4 bytes/cell) cross the link.

Why this exists (measured, docs/benchmarks.md round 5): the 1.3M x
3451 wire-staged epoch is LINK-bound at ~29 s — ~2 GB of payload wire
bytes per epoch at the tunnel's ~70 MB/s against ~2 s of train compute.
That same payload is ~2 GB compressed, so residing it in HBM removes
the wire cost entirely.  Measured steady epochs: **22.4 s (58,008
cells/s), +-0.1 s across epochs** — 1.3x the wire path's best AND free
of its weather variance (the wire arm swung 29-137 s across sessions).

The result is gather-form-sensitive in a way worth remembering: the
first cut read the payload as ``col[starts[rows] + k]`` — 2x182M
elementwise gathers per part — and measured 3.2x SLOWER than the wire
path (8.96 s/part, of which 7.45 s was the gather alone;
scripts/resident_probe.py).  Re-expressing the same read as B length-K
``dynamic_slice`` gathers (CSR rows are contiguous) dropped the part
rebuild to 2.14 s.  TPU gathers of small elements at arbitrary offsets
run element-at-a-time; gathers of contiguous slices run at copy speed.

Remaining floor: ~2 s/part is still the padded rebuild (K=1388 vs ~380
mean nnz/row).  The documented next step below it is a scatter-free
sparse NLL — compute the y=0 closed form densely from (mean, theta, pi)
and add gathered per-nonzero corrections — which removes the dense
target entirely.

Reference analogue: none — the reference's Keras fit holds the DENSE
matrix resident in host RAM and re-feeds it per batch
(/root/reference/dca/train.py:83); this is the TPU-native equivalent
for corpora whose dense form (18 GB at 1.3M x 3451) fits in neither
host RAM comfortably nor HBM at all, but whose sparse form fits HBM.

Trajectory parity: the gathered (B, K) payload carries the same
canonical-CSR column ids and raw-count values as the wire path's
``payload_from_csr``, the scatter is the same program, and the derive
is the same expression over the same f32 ``m`` — so the training
trajectory is IDENTICAL to the streamed run with the same seed
(tests/test_streaming.py::test_resident_matches_streaming).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .densify import _scatter_impl


@functools.partial(jax.jit, static_argnames=("K", "n_cols"))
def _part_impl(starts, lens, col, val, m, sf, mu, sd, rows, K, n_cols):
    """One staged part from resident CSR: (x_scaled, t_raw, sf_part).

    ``rows`` (B,) int32 selects this part's (shuffled) cells.  Slot k of
    payload row r reads ``col/val[starts[r] + k]`` while k < lens[r] —
    and because each CSR row is CONTIGUOUS in col/val, that read is a
    gather of B length-K SLICES (``vmap(dynamic_slice)``), not 182M
    independent element gathers.  The distinction is the whole ballgame
    on this hardware: the elementwise ``col[offs]`` form measured
    7.45 s/part on the 1.3M corpus vs ~1.5 s for everything else in the
    program combined (scripts/resident_probe.py) — slice gathers move
    the same bytes as contiguous copies instead.  ``col``/``val`` arrive
    padded by K trailing elements so the last rows' slices stay in
    bounds without dynamic_slice's start-clamping misaligning them.
    Padding slots carry the out-of-range column id ``n_cols`` so the
    scatter drops them (same contract as native.csr_to_padded payloads;
    hints deliberately not passed — platform bug, see _scatter_impl)."""
    s = starts[rows]
    ln = lens[rows]
    k = jax.lax.broadcasted_iota(jnp.int32, (rows.shape[0], K), 1)
    mask = k < ln[:, None]
    seg_col = jax.vmap(
        lambda st: jax.lax.dynamic_slice(col, (st,), (K,)))(s)
    seg_val = jax.vmap(
        lambda st: jax.lax.dynamic_slice(val, (st,), (K,)))(s)
    idx = jnp.where(mask, seg_col.astype(jnp.int32), n_cols)
    dat = jnp.where(mask, seg_val.astype(jnp.float32), 0.0)
    t = _scatter_impl(idx, dat, n_cols)
    x = (jnp.log1p(t * m[rows][:, None]) - mu) / sd
    return x, t, sf[rows]


class ResidentCSR:
    """Upload a raw-count CSR corpus to the device once; stage shuffled
    dense parts from it with zero per-part host work or payload transfer.

    Requires the ship-one-payload configuration (the trainer's verified
    per-row derive multiplier ``m``): only the TARGET values are stored
    and the normalized input is derived on device.  Auto-engaged by the
    trainer inside the DCA_TPU_RESIDENT_MIN_BYTES..DCA_TPU_RESIDENT_BYTES
    HBM budget; DCA_TPU_RESIDENT=1/0 forces.
    """

    def __init__(self, T, m, sf, scale_mean, scale_std):
        from ..data.loader import canonicalize_csr

        canonicalize_csr(T)
        self.n, self.G = T.shape
        assert T.nnz < np.iinfo(np.int32).max, "resident CSR needs nnz < 2^31"
        lens = np.diff(T.indptr).astype(np.int32)
        self.K = max(int(lens.max()) if lens.size else 0, 1)
        col = T.indices
        if self.G < np.iinfo(np.int16).max:
            col = col.astype(np.int16)
        else:
            col = col.astype(np.int32)
        d = T.data
        if (d.size and np.all(d >= 0) and d.max() < np.iinfo(np.uint16).max
                and np.all(np.floor(d) == d)):
            val = d.astype(np.uint16)  # lossless for raw counts
        else:
            val = d.astype(np.float32)
        # K trailing pad elements keep the tail rows' dynamic_slice
        # gathers in bounds (see _part_impl); masked, never read as data
        col = np.concatenate([col, np.zeros(self.K, col.dtype)])
        val = np.concatenate([val, np.zeros(self.K, val.dtype)])
        # one batched upload (separate puts pay per-call tunnel latency)
        (self.starts_d, self.lens_d, self.col_d, self.val_d, self.m_d,
         self.sf_d, self.mu_d, self.sd_d) = jax.device_put((
             T.indptr[:-1].astype(np.int32), lens, col, val,
             np.asarray(m, np.float32), np.asarray(sf, np.float32),
             np.asarray(scale_mean, np.float32),
             np.asarray(scale_std, np.float32),
         ))

    @staticmethod
    def payload_bytes(T):
        """Resident HBM footprint estimate for gating (columns + values +
        per-row vectors), using the dtypes __init__ would pick."""
        col_b = 2 if T.shape[1] < np.iinfo(np.int16).max else 4
        # value integrality is checked for real in __init__; assume the
        # compact stream here (an f32 fallback doubles one term only)
        return int(T.nnz) * (col_b + 2) + int(T.shape[0]) * 16

    def part(self, rows):
        """Stage one part: returns device (x, t, sf) for ``rows``."""
        rows_d = jnp.asarray(np.ascontiguousarray(rows, dtype=np.int32))
        return _part_impl(self.starts_d, self.lens_d, self.col_d,
                          self.val_d, self.m_d, self.sf_d, self.mu_d,
                          self.sd_d, rows_d, self.K, self.G)
