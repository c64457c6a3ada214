"""Map binning kernels.

TPU scatters are slow (~7 ns/sample for jax.ops.segment_sum), so the hot
binning path exploits the scan geometry the same way the windowed
sampler does: within a short time chunk, every detector sample falls in
a small pixel window around the boresight track. Binning then becomes a
pair of one-hot hat matrices contracted on the MXU per chunk,

    window[y, x] = sum_{d,t} data[d,t] * 1[iy=oy+y] * 1[ix=ox+x]
                 = einsum('dty,dtx->yx', onehot_y * data, onehot_x)

followed by ONE dynamic-slice accumulate of the (wy, wx) window per
chunk — no scatters anywhere. Window origins are host-precomputed from
the (static) pointing; a host-side check guarantees the windows cover
every sample, falling back to segment_sum otherwise.

Reference behavior: maria/mappers/bin_mapper.py:100-112 (sparse CSR
matvec on the host).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["WindowedBinPlan", "make_windowed_bin_plan", "bin_windowed", "bin_scatter"]


@dataclass
class WindowedBinPlan:
    """Host-precomputed static geometry for `bin_windowed`."""

    n_y: int
    n_x: int
    wy: int
    wx: int
    chunk: int
    n_chunks: int
    origins: np.ndarray  # (n_chunks, 2) int32 window corners (oy, ox)
    iy: np.ndarray  # (n_det, n_chunks * chunk) int32, padded with -1
    ix: np.ndarray


def make_windowed_bin_plan(iy, ix, n_y: int, n_x: int, chunk: int = 64) -> WindowedBinPlan:
    """Build the plan from static per-sample pixel rows/cols.

    Returns None if any chunk's pixel span exceeds a sane window size
    (then use `bin_scatter`). Out-of-map samples must already be marked
    with negative indices (they get zero one-hot weight).
    """
    iy = np.asarray(iy, dtype=np.int32)
    ix = np.asarray(ix, dtype=np.int32)
    n_det, n_t = iy.shape
    n_chunks = -(-n_t // chunk)
    pad = n_chunks * chunk - n_t
    if pad:
        iy = np.pad(iy, ((0, 0), (0, pad)), constant_values=-1)
        ix = np.pad(ix, ((0, 0), (0, pad)), constant_values=-1)

    iy_c = iy.reshape(n_det, n_chunks, chunk)
    ix_c = ix.reshape(n_det, n_chunks, chunk)
    valid = iy_c >= 0

    def span(a):
        lo = np.where(valid, a, np.iinfo(np.int32).max).min(axis=(0, 2))
        hi = np.where(valid, a, -1).max(axis=(0, 2))
        lo = np.minimum(lo, hi)  # empty chunks
        return lo, hi

    oy, hi_y = span(iy_c)
    ox, hi_x = span(ix_c)
    wy = int(-(-(hi_y - oy + 1).max() // 8) * 8)
    wx = int(-(-(hi_x - ox + 1).max() // 8) * 8)
    if wy * wx > 0.5 * n_y * n_x or wy > n_y or wx > n_x:
        return None  # windows wouldn't pay off; caller falls back to scatter

    oy = np.clip(oy, 0, n_y - wy)
    ox = np.clip(ox, 0, n_x - wx)
    return WindowedBinPlan(
        n_y=n_y, n_x=n_x, wy=wy, wx=wx, chunk=chunk, n_chunks=n_chunks,
        origins=np.stack([oy, ox], axis=-1).astype(np.int32),
        iy=iy, ix=ix,
    )


def bin_windowed(data, plan: WindowedBinPlan, weights=None, iy=None, ix=None):
    """Bin data into (n_y, n_x) maps with the MXU.

    `data` is (n_det, n_t) or channel-stacked (n_ch, n_det, n_t) — all
    channels share ONE set of one-hot hat matrices (built once per
    chunk), so multi-Stokes binning costs the matmuls, not the hats.
    `weights` optionally scales each sample (same shape as data).
    `iy`/`ix` optionally override the plan's index arrays with device
    arrays — pass them as jit ARGUMENTS for large detector counts, since
    closure constants of that size blow the remote-compile request.
    Pure jnp; call under jit.
    """
    squeeze = data.ndim == 2
    if squeeze:
        data = data[None]
        if weights is not None:
            weights = weights[None]
    n_ch, n_det, n_t = data.shape
    pad = plan.n_chunks * plan.chunk - n_t
    if weights is not None:
        data = data * weights
    if pad:
        data = jnp.pad(data, ((0, 0), (0, 0), (0, pad)))

    iy = jnp.asarray(plan.iy) if iy is None else iy
    ix = jnp.asarray(plan.ix) if ix is None else ix
    data_c = data.reshape(n_ch, n_det, plan.n_chunks, plan.chunk)
    iy_c = iy.reshape(n_det, plan.n_chunks, plan.chunk)
    ix_c = ix.reshape(n_det, plan.n_chunks, plan.chunk)
    origins = jnp.asarray(plan.origins)

    ky = jnp.arange(plan.wy, dtype=jnp.int32)
    kx = jnp.arange(plan.wx, dtype=jnp.int32)

    def body(m, args):
        d, ly, lx, origin = args  # d: (n_ch, n_det, chunk)
        # one-hot hats; out-of-window (incl. padded/off-map) rows vanish
        wY = (ly[..., None] == ky).astype(d.dtype)  # (n_det, chunk, wy)
        wX = (lx[..., None] == kx).astype(d.dtype)  # (n_det, chunk, wx)
        # full f32: the default TPU matmul precision truncates the data
        # to bf16, which is visible in binned sums
        window = jnp.einsum(
            "dcy,dcx,mdc->myx", wY, wX, d, precision=jax.lax.Precision.HIGHEST
        )
        block = jax.lax.dynamic_slice(m, (0, origin[0], origin[1]), (n_ch, plan.wy, plan.wx))
        m = jax.lax.dynamic_update_slice(m, block + window, (0, origin[0], origin[1]))
        return m, ()

    m0 = jnp.zeros((n_ch, plan.n_y, plan.n_x), dtype=data.dtype)
    ly = jnp.moveaxis(iy_c, 1, 0) - origins[:, 0][:, None, None]
    lx = jnp.moveaxis(ix_c, 1, 0) - origins[:, 1][:, None, None]
    m, _ = jax.lax.scan(body, m0, (jnp.moveaxis(data_c, 2, 0), ly, lx, origins))
    return m[0] if squeeze else m


def bin_scatter(data, pix, n_pix: int, weights=None):
    """segment_sum fallback for irregular pointing."""
    if weights is not None:
        data = data * weights
    return jax.ops.segment_sum(data.ravel(), pix.ravel(), num_segments=n_pix)


@dataclass
class RunLengthBinPlan:
    """Host-precomputed run-length compression of static pixel ids.

    A scanning detector dwells several consecutive samples in each map
    pixel, so the (huge) per-sample scatter reduces exactly to a
    (much smaller) per-run scatter: run sums come from differences of a
    per-detector cumulative sum. NOTE: measured on v5e this is only at
    parity with the raw scatter (~0.97 s vs 1.05 s for a 50k x 3000
    TOD) because TPU gathers cost as much per element (~14 ns) as
    scatters — the two boundary gathers eat the 7x scatter-volume win.
    Kept for backends where gathers outpace scatters.
    """

    n_pix: int
    n_t: int
    starts: np.ndarray  # (n_runs,) int32, flat into the (n_det, n_t+1) cumsum
    ends: np.ndarray  # (n_runs,) int32, exclusive
    run_pix: np.ndarray  # (n_runs,) int32


def make_runlength_bin_plan(pix, n_pix: int) -> RunLengthBinPlan:
    """Build the plan from static per-sample pixel ids (n_det, n_t)."""
    pix = np.asarray(pix, dtype=np.int32)
    n_det, n_t = pix.shape
    # run boundaries: start of row, or pixel change within a row
    change = np.ones((n_det, n_t), dtype=bool)
    change[:, 1:] = pix[:, 1:] != pix[:, :-1]
    det_idx, t_start = np.nonzero(change)
    # local end = next run's start within the same row, else n_t
    t_end = np.empty_like(t_start)
    same_row = det_idx[1:] == det_idx[:-1]
    t_end[:-1] = np.where(same_row, t_start[1:], n_t)
    t_end[-1] = n_t
    # flat indices into the zero-prefixed (n_det, n_t+1) cumsum:
    # run sum over [t0, t1) = cs[det, t1] - cs[det, t0]
    row = det_idx * (n_t + 1)
    return RunLengthBinPlan(
        n_pix=n_pix, n_t=n_t,
        starts=(row + t_start).astype(np.int32),
        ends=(row + t_end).astype(np.int32),
        run_pix=pix[det_idx, t_start].astype(np.int32),
    )


def bin_runlength(data, starts, ends, run_pix, n_pix: int):
    """Exact binning via per-row cumsum + per-run differences.

    `starts`/`ends`/`run_pix` are the plan arrays; pass them as jit
    ARGUMENTS (tens of MB — closure constants blow the compile request)."""
    n_det, n_t = data.shape
    cs = jnp.cumsum(data, axis=-1)
    cs = jnp.concatenate([jnp.zeros((n_det, 1), dtype=data.dtype), cs], axis=-1).ravel()
    run_sums = jnp.take(cs, ends) - jnp.take(cs, starts)
    return jax.ops.segment_sum(run_sums, run_pix, num_segments=n_pix)
