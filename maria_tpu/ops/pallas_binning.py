"""Pallas TPU kernel for blocked map binning — a measured NEGATIVE result.

Hypothesis: the XLA path (`ops.binning.bin_blocked`) materializes its
one-hot hat matrices in HBM (~(wy+wx) floats per sample, tens of GB per
minute-long wide-field TOD), so building the hats in VMEM and
accumulating the map in a VMEM scratch should win. This kernel does
exactly that: hats never touch HBM, the contraction runs in TWO bf16
MXU passes via an exact hi/lo split of the data (one-hot entries are
bf16-exact, so the only rounding is the split, ~1e-7 relative), and
HBM traffic drops to one read of data+offsets plus one map write.

Measured on v5e (50k dets x 3000 samples, 128x128 map): 143 ms vs
77 ms for the XLA einsum path. The op is MXU-throughput-bound, not
HBM-bound: a one-hot contraction costs ~0.17 ns/sample per bf16 pass
*independent of window size* (output-tile under-utilization scales
exactly with the FLOP saving), and XLA overlaps its hat traffic with
those matmuls better than this kernel's serialized fori_loop
sub-slices. Kept as a working, tested reference kernel — NOT wired
into any default path; `bin_blocked` remains authoritative. See
docs/tpu-design.md "Binning roofline".

Mosaic constraints that shaped it (useful precedents): the x-window
must span the full lane dim (dynamic lane-offset stores don't lower);
hats must be flattened to 2-D with contraction on lhs dim 1 (dim-0
contraction inserts a slow transpose relayout); the sub-slice loop must
be a fori_loop (a Python loop unrolls and the live hats blow the 16 MB
scoped-vmem budget, crashing the AOT compile helper).

Same plan (`make_blocked_bin_plan`) and semantics as the XLA path.
Reference behavior: maria/mappers/bin_mapper.py:100-112.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bin_blocked_pallas", "supports_pallas"]

_LANE = 128


def supports_pallas() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _kernel(origins_ref, d_ref, ly_ref, lx_ref, out_ref, acc_ref, *, wy, n_x, n_rows):
    c = pl.program_id(0)
    b = pl.program_id(1)
    first = (c == 0) & (b == 0)
    last = (c == pl.num_programs(0) - 1) & (b == pl.num_programs(1) - 1)

    @pl.when(first)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    flat = c * pl.num_programs(1) + b
    oy = origins_ref[2 * flat]
    ox = origins_ref[2 * flat + 1]

    # process the tile in row sub-slices so the VMEM-resident hats stay
    # small; MUST be a fori_loop — a Python loop unrolls and the compiler
    # keeps every iteration's hats alive, blowing the 16 MB scoped-vmem
    # budget (the AOT helper crashes rather than erroring). R must divide
    # n_rows exactly or the tail rows would be silently dropped.
    R = next(r for r in range(min(32, n_rows), 0, -1) if n_rows % r == 0)
    N = R * _LANE
    # y-hats built directly TRANSPOSED (wy, N) so the dot is in standard
    # (M,K)@(K,N) orientation — contraction on lhs dim 0 makes Mosaic
    # insert a slow per-slice transpose relayout
    kyT = jax.lax.broadcasted_iota(jnp.int32, (wy, R, _LANE), 0)
    kx = jax.lax.broadcasted_iota(jnp.int32, (R, _LANE, n_x), 2)

    def sub_body(s, win):
        sl = pl.ds(s * R, R)
        ly = ly_ref[0, 0, sl].astype(jnp.int32)  # (R, 128) local y, -1 = skip
        lx = lx_ref[0, 0, sl].astype(jnp.int32)
        d = d_ref[0, 0, sl]  # (R, 128) f32
        valid = (ly >= 0) & (lx >= 0)
        lx_abs = jnp.where(valid, lx + ox, -1)

        # one-hot hats, built in VMEM (never written to HBM); one-hot
        # entries are exact in bf16
        wYT = (ly[None] == kyT).astype(jnp.float32).reshape(wy, N)
        wX = (lx_abs[..., None] == kx).astype(jnp.bfloat16).reshape(N, n_x)

        # exact hi/lo split: data = hi + lo, both bf16-representable
        d_hi = d.astype(jnp.bfloat16)
        d_lo = (d - d_hi.astype(jnp.float32)).astype(jnp.bfloat16)

        for part in (d_hi, d_lo):
            wYd = (wYT * part.astype(jnp.float32).reshape(1, N)).astype(jnp.bfloat16)
            win = win + jax.lax.dot_general(
                wYd,
                wX,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (wy, n_x)
        return win

    win = jax.lax.fori_loop(
        0, n_rows // R, sub_body, jnp.zeros((wy, n_x), dtype=jnp.float32)
    )
    acc_ref[pl.ds(oy, wy), :] += win

    @pl.when(last)
    def _():
        out_ref[:] = acc_ref[:]


def bin_blocked_pallas(data, plan, ly=None, lx=None, origins=None, order=None, interpret=False):
    """Bin (n_det, n_t) data into a (n_y, n_x) map with the Pallas kernel.

    Drop-in for single-channel `bin_blocked` on TPU when n_x <= 128;
    pass the plan's `device_args()` as jit arguments. `interpret=True`
    runs the kernel in interpreter mode (for CPU tests)."""
    if plan.n_x > _LANE:
        raise ValueError(f"pallas binning requires n_x <= {_LANE} (got {plan.n_x}).")
    ly = jnp.asarray(plan.ly) if ly is None else ly
    lx = jnp.asarray(plan.lx) if lx is None else lx
    origins = jnp.asarray(plan.origins) if origins is None else origins
    order = jnp.asarray(plan.order) if order is None else order

    n_det, n_t = data.shape
    DB, CHUNK = plan.det_block, plan.chunk
    NB, NC = plan.n_blocks, plan.n_chunks
    N = DB * CHUNK
    if N % _LANE:
        raise ValueError(f"det_block * chunk must be a multiple of {_LANE} (got {N}).")
    n_rows = N // _LANE

    pad_t = NC * CHUNK - n_t
    d = jnp.take(data, order, axis=0)
    if pad_t:
        d = jnp.pad(d, ((0, 0), (0, pad_t)))
    # lay each (block, chunk) tile out as lane-major (n_rows, 128)
    d = d.reshape(NB, DB, NC, CHUNK).transpose(2, 0, 1, 3).reshape(NC, NB, n_rows, _LANE)
    ly_t = ly.astype(jnp.int32).transpose(2, 0, 1, 3).reshape(NC, NB, n_rows, _LANE)
    lx_t = lx.astype(jnp.int32).transpose(2, 0, 1, 3).reshape(NC, NB, n_rows, _LANE)
    org_flat = origins.transpose(1, 0, 2).reshape(-1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NC, NB),
        in_specs=[
            pl.BlockSpec((1, 1, n_rows, _LANE), lambda c, b, org: (c, b, 0, 0)),
            pl.BlockSpec((1, 1, n_rows, _LANE), lambda c, b, org: (c, b, 0, 0)),
            pl.BlockSpec((1, 1, n_rows, _LANE), lambda c, b, org: (c, b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((plan.n_y, plan.n_x), lambda c, b, org: (0, 0)),
        scratch_shapes=[pltpu.VMEM((plan.n_y, plan.n_x), jnp.float32)],
    )

    return pl.pallas_call(
        partial(_kernel, wy=plan.wy, n_x=plan.n_x, n_rows=n_rows),
        out_shape=jax.ShapeDtypeStruct((plan.n_y, plan.n_x), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(org_flat, d, ly_t, lx_t)
