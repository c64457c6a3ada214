"""Multi-chip map binning.

The reference bins TODs into maps with a host-side sparse CSR matvec
(maria/mappers/bin_mapper.py:100-112). On a device mesh the same
reduction is: every (det, time) shard bins its LOCAL TOD block with the
MXU-blocked one-hot kernel (ops/binning.py), then ONE `psum` over both
mesh axes reduces the partial maps — binning is a segment-sum reduction
across shards (SURVEY.md §2 "Parallelism & communication").

Host side, `make_sharded_bin_plan` builds one `BlockedBinPlan` per mesh
shard from the static pointing. Every shard sees the same local
(n_det/n_det_shards, n_t/n_time_shards) block shape, so the per-shard
plans share n_blocks/n_chunks automatically; the window size is forced
to the max over shards so all plans have identical static shapes and
the shard_map body compiles once.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.binning import BlockedBinPlan, bin_blocked, make_blocked_bin_plan

__all__ = ["ShardedBinPlan", "make_sharded_bin_plan", "bin_blocked_sharded"]


@dataclass
class ShardedBinPlan:
    """Per-shard blocked plans with identical static shapes.

    `local` is the shape template every shard's kernel compiles against;
    the stacked index arrays carry leading (n_det_shards, n_time_shards)
    axes and ride to the devices as shard_map inputs sharded
    P(det_axis, time_axis)."""

    local: BlockedBinPlan
    det_axis: str
    time_axis: str
    n_det_shards: int
    n_time_shards: int
    ly: np.ndarray  # (n_ds, n_ts, n_blocks, det_block, n_chunks, chunk)
    lx: np.ndarray
    origins: np.ndarray  # (n_ds, n_ts, n_blocks, n_chunks, 2)
    order: np.ndarray  # (n_ds, n_ts, n_blocks * det_block)

    def mesh_axes(self, mesh):
        """(det_axis or None, time_axis or None) restricted to the axes
        this mesh actually has (a det-only mesh has one time shard)."""
        names = set(mesh.axis_names)
        return (
            self.det_axis if self.det_axis in names else None,
            self.time_axis if self.time_axis in names else None,
        )

    def device_args(self, mesh):
        spec = P(*self.mesh_axes(mesh))
        put = lambda a: jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec))  # noqa: E731
        return (put(self.ly), put(self.lx), put(self.origins), put(self.order))


def make_sharded_bin_plan(
    iy,
    ix,
    n_y: int,
    n_x: int,
    mesh,
    det_axis: str = "det",
    time_axis: str = "time",
    chunk: int = 64,
    det_block: int = 512,
    max_window_frac: float = 0.5,
    orders: list = None,
) -> ShardedBinPlan:
    """Build per-shard MXU binning plans from static (n_det, n_t) pixel
    rows/cols. The detector and time axes must already be padded to
    multiples of the mesh axis sizes (mark padded samples with negative
    indices). `orders` optionally gives each det shard's precomputed
    local Hilbert order (len n_det_shards) — callers binning many time
    bins of the same pointing share the sorts.
    Returns None when any shard's window would not pay off
    (fall back to a sharded segment-sum)."""
    iy = np.asarray(iy, dtype=np.int32)
    ix = np.asarray(ix, dtype=np.int32)
    n_det, n_t = iy.shape
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    # a mesh may carry only one of the two axes (e.g. a det-only mesh);
    # the missing axis simply has one shard
    n_ds, n_ts = sizes.get(det_axis, 1), sizes.get(time_axis, 1)
    if n_det % n_ds or n_t % n_ts:
        raise ValueError(
            f"pad the TOD to the mesh first: ({n_det}, {n_t}) is not divisible by ({n_ds}, {n_ts})"
        )
    d_local, t_local = n_det // n_ds, n_t // n_ts

    def shard_block(a, i, j):
        return a[i * d_local : (i + 1) * d_local, j * t_local : (j + 1) * t_local]

    # pass 1: fit each shard's own window
    fitted = []
    for i in range(n_ds):
        for j in range(n_ts):
            p = make_blocked_bin_plan(
                shard_block(iy, i, j), shard_block(ix, i, j), n_y, n_x,
                chunk=chunk, det_block=det_block, max_window_frac=max_window_frac,
                order=None if orders is None else orders[i],
            )
            if p is None:
                return None
            fitted.append(p)
    wy = max(p.wy for p in fitted)
    wx = max(p.wx for p in fitted)

    # pass 2: identical static shapes via the common (max) window
    plans = []
    for i in range(n_ds):
        for j in range(n_ts):
            p = make_blocked_bin_plan(
                shard_block(iy, i, j), shard_block(ix, i, j), n_y, n_x,
                chunk=chunk, det_block=det_block, max_window_frac=max_window_frac,
                force_window=(wy, wx),
                order=None if orders is None else orders[i],
            )
            if p is None:
                return None
            plans.append(p)

    local = plans[0]
    stack = lambda attr: np.stack([getattr(p, attr) for p in plans]).reshape(  # noqa: E731
        n_ds, n_ts, *getattr(local, attr).shape
    )
    return ShardedBinPlan(
        local=local, det_axis=det_axis, time_axis=time_axis,
        n_det_shards=n_ds, n_time_shards=n_ts,
        ly=stack("ly"), lx=stack("lx"), origins=stack("origins"), order=stack("order"),
    )


def bin_blocked_sharded(data, plan: ShardedBinPlan, mesh, device_args=None, weights=None):
    """Bin a mesh-sharded TOD into replicated (n_y, n_x) map(s).

    `data` is (n_det, n_t) or channel-stacked (n_ch, n_det, n_t), laid
    out P(det, time) on `mesh` (or any layout — it is resharded). Each
    shard runs the MXU-blocked kernel on its local block with its own
    plan, then one psum over both axes reduces the partials. Equals the
    single-device `bin_blocked` / segment-sum to f32 accumulation order
    (tested)."""
    args = plan.device_args(mesh) if device_args is None else device_args
    da, ta = plan.mesh_axes(mesh)
    axes = tuple(a for a in (da, ta) if a is not None)
    if not axes:
        raise ValueError(f"mesh {mesh.axis_names} has neither a det nor a time axis")
    spec = P(da, ta)
    if weights is not None:
        data = data * weights  # bin_blocked folds weights the same way
    stacked = data.ndim == 3
    data_spec = P(None, da, ta) if stacked else spec

    fn = _cached_shard_bin_fn(mesh, axes, _static_key(plan.local), data_spec, spec)
    with mesh:
        data = jax.device_put(data, NamedSharding(mesh, data_spec))
        return fn(data, *args)


def _static_key(local: BlockedBinPlan) -> tuple:
    """The static shape fields bin_blocked reads from the plan (index
    arrays always ride as arguments here)."""
    return (
        local.n_y, local.n_x, local.wy, local.wx, local.chunk,
        local.n_chunks, local.det_block, local.n_blocks, local.n_t,
    )


@lru_cache(maxsize=64)
def _cached_shard_bin_fn(mesh, axes, static_key, data_spec, spec):
    """One jitted shard_map per (mesh, plan shapes): callers binning many
    time bins would otherwise build a fresh closure per block and
    retrace/recompile every time (jit caches on function identity)."""
    shell = BlockedBinPlan(
        n_y=static_key[0], n_x=static_key[1], wy=static_key[2], wx=static_key[3],
        chunk=static_key[4], n_chunks=static_key[5], det_block=static_key[6],
        n_blocks=static_key[7], n_t=static_key[8],
        order=None, ly=None, lx=None, origins=None,
    )

    def shard_fn(d, ly, lx, origins, order):
        m = bin_blocked(
            d, shell, ly=ly[0, 0], lx=lx[0, 0], origins=origins[0, 0],
            order=order[0, 0], pvary_axes=axes,
        )
        return jax.lax.psum(m, axes)

    return jax.jit(
        jax.shard_map(shard_fn, mesh=mesh, in_specs=(data_spec,) + (spec,) * 4, out_specs=P())
    )
