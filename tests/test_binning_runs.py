"""Run-compressed MXU binning == f64 scatter oracle.

The plan builder and `bin_runchunk` must reproduce the reference
binning semantics (maria/mappers/bin_mapper.py:100-112: every valid
sample's value lands in its pixel, off-map samples dropped) through
run compression + cumsum differences + the shifted bf16 contraction.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maria_tpu.ops.binning import bin_blocked, make_blocked_bin_plan_on_device
from maria_tpu.ops.binning_runs import bin_runchunk, make_runchunk_bin_plan_on_device


def _scene(n_det=96, n_t=1000, n_y=64, n_x=64, dwell=7, off_map_frac=0.02, seed=0):
    """Random-walk pointing with realistic per-pixel dwell."""
    rng = np.random.default_rng(seed)
    n_moves = -(-n_t // dwell)
    # per-detector random walk over pixels, repeated `dwell` samples each
    start_y = rng.integers(4, n_y - 4, n_det)
    start_x = rng.integers(4, n_x - 4, n_det)
    step = rng.integers(-1, 2, (n_det, n_moves, 2))
    pos = np.stack([start_y, start_x], -1)[:, None, :] + np.cumsum(step, axis=1)
    pos = np.repeat(pos, dwell, axis=1)[:, :n_t]
    iy = np.clip(pos[..., 0], 0, n_y - 1).astype(np.int32)
    ix = np.clip(pos[..., 1], 0, n_x - 1).astype(np.int32)
    off = rng.random((n_det, n_t)) < off_map_frac
    iy[off] = -1
    ix[off] = -1
    data = (100.0 + rng.standard_normal((n_det, n_t))).astype(np.float32)
    return iy, ix, data


def _oracle(data, iy, ix, n_y, n_x):
    m = np.zeros((n_y, n_x), np.float64)
    valid = (iy >= 0) & (ix >= 0)
    np.add.at(m, (iy[valid], ix[valid]), data.astype(np.float64)[valid])
    return m


def _hits_oracle(iy, ix, n_y, n_x):
    m = np.zeros((n_y, n_x), np.float64)
    valid = (iy >= 0) & (ix >= 0)
    np.add.at(m, (iy[valid], ix[valid]), 1.0)
    return m


@pytest.mark.parametrize(
    "chunk,det_block,seg", [(64, 32, 64), (128, 96, 32), (256, 64, 64), (256, 48, 256)]
)
def test_runchunk_matches_scatter(chunk, det_block, seg):
    n_y = n_x = 64
    iy, ix, data = _scene(n_t=1000 if chunk < 256 else 1100)
    plan = make_runchunk_bin_plan_on_device(
        jnp.asarray(iy), jnp.asarray(ix), n_y, n_x, chunk=chunk, det_block=det_block,
        seg=seg, max_window_frac=1.01,
    )
    assert plan is not None
    assert plan.r_max < plan.seg  # compression actually happened
    ref = _oracle(data, iy, ix, n_y, n_x)
    got = np.asarray(jax.jit(
        lambda d, e, ly, lx, o, od, w: bin_runchunk(
            d, plan, e_idx=e, run_ly=ly, run_lx=lx, origins=o, order=od, wcnt=w)
    )(jnp.asarray(data), *plan.device_args()))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=2e-5 * scale)
    # static hits map matches the oracle exactly
    np.testing.assert_array_equal(plan.hits, _hits_oracle(iy, ix, n_y, n_x))


def test_runchunk_matches_bin_blocked():
    """Same plan geometry class: run compression must not change the map
    beyond f32 accumulation noise."""
    n_y = n_x = 64
    iy, ix, data = _scene(seed=3)
    bplan = make_blocked_bin_plan_on_device(
        jnp.asarray(iy), jnp.asarray(ix), n_y, n_x, chunk=64, det_block=32,
        max_window_frac=1.01,
    )
    rplan = make_runchunk_bin_plan_on_device(
        jnp.asarray(iy), jnp.asarray(ix), n_y, n_x, chunk=64, det_block=32,
        max_window_frac=1.01,
    )
    a = np.asarray(bin_blocked(jnp.asarray(data), bplan, precision="shifted"))
    b = np.asarray(bin_runchunk(jnp.asarray(data), rplan))
    scale = np.abs(a).max()
    np.testing.assert_allclose(a, b, atol=2e-5 * scale)


def test_runchunk_channels_and_weights():
    """Channel-stacked (W*D, W) binning — the BinMapper pattern."""
    n_y = n_x = 48
    iy, ix, data = _scene(n_det=40, n_t=500, n_y=48, n_x=48, seed=1)
    rng = np.random.default_rng(2)
    w = rng.random((40, 500)).astype(np.float32) + 0.5
    plan = make_runchunk_bin_plan_on_device(
        jnp.asarray(iy), jnp.asarray(ix), n_y, n_x, chunk=64, det_block=16,
        max_window_frac=1.01,
    )
    assert plan is not None
    stacked = jnp.stack([jnp.asarray(data * w), jnp.asarray(w)])
    # random per-sample weights are the worst case for the one-pass
    # shifted scheme (the in-chunk fluctuation IS the signal scale);
    # the unshifted hilo 2-pass split holds ~2^-16 of the run-sum scale
    got = np.asarray(bin_runchunk(stacked, plan, precision="hilo"))
    np.testing.assert_allclose(
        got[0], _oracle(data * w, iy, ix, n_y, n_x), atol=2e-4 * float(np.abs(data * w).max())
    )
    np.testing.assert_allclose(got[1], _oracle(w, iy, ix, n_y, n_x), atol=2e-3)
    # one-pass shifted stays within its documented ~2^-9-of-fluctuation bound
    got_s = np.asarray(bin_runchunk(stacked, plan))
    ref0 = _oracle(data * w, iy, ix, n_y, n_x)
    np.testing.assert_allclose(got_s[0], ref0, atol=4e-3 * float(np.abs(ref0).max()))


def test_runchunk_tail_and_padding():
    """n_t not divisible by chunk; n_det not divisible by det_block."""
    n_y = n_x = 32
    iy, ix, data = _scene(n_det=37, n_t=331, n_y=32, n_x=32, seed=4)
    plan = make_runchunk_bin_plan_on_device(
        jnp.asarray(iy), jnp.asarray(ix), n_y, n_x, chunk=64, det_block=16,
        max_window_frac=1.01,
    )
    assert plan is not None
    got = np.asarray(bin_runchunk(jnp.asarray(data), plan))
    ref = _oracle(data, iy, ix, n_y, n_x)
    np.testing.assert_allclose(got, ref, atol=2e-5 * float(np.abs(ref).max()))
    np.testing.assert_array_equal(plan.hits, _hits_oracle(iy, ix, n_y, n_x))


def test_runchunk_hilo_exact_zeros():
    """Pixels whose channel data is uniformly zero (time-bin-masked
    frames) must come out EXACTLY zero under hilo — the shifted mode's
    mean restore leaves ~1e-7 cancellation residue there, which a naive
    map division or a Jacobi preconditioner then amplifies (measured to
    break the ML mapper's CG)."""
    n_y = n_x = 48
    iy, ix, data = _scene(n_det=32, n_t=512, n_y=48, n_x=48, off_map_frac=0.0, seed=9)
    plan = make_runchunk_bin_plan_on_device(
        jnp.asarray(iy), jnp.asarray(ix), n_y, n_x, chunk=64, det_block=16,
        max_window_frac=1.01,
    )
    assert plan is not None
    # frame mask: data zeroed in the second half of time
    mask = np.zeros_like(data)
    mask[:, : data.shape[1] // 2] = 1.0
    masked = jnp.asarray(data * mask)
    got = np.asarray(bin_runchunk(masked, plan, precision="hilo"))
    # pixels hit ONLY in the masked-out half must be exactly zero
    only_late = (_hits_oracle(iy[:, data.shape[1] // 2:], ix[:, data.shape[1] // 2:], n_y, n_x) > 0) & (
        _hits_oracle(iy[:, : data.shape[1] // 2], ix[:, : data.shape[1] // 2], n_y, n_x) == 0
    )
    assert only_late.any()
    assert np.all(got[only_late] == 0.0)


def test_runchunk_rejects_fast_scans():
    """Every sample a new pixel -> no compression -> plan refuses."""
    rng = np.random.default_rng(5)
    iy = rng.integers(0, 32, (16, 256)).astype(np.int32)
    ix = rng.integers(0, 32, (16, 256)).astype(np.int32)
    plan = make_runchunk_bin_plan_on_device(
        jnp.asarray(iy), jnp.asarray(ix), 32, 32, chunk=64, det_block=16,
        max_window_frac=1.01,
    )
    assert plan is None


def test_runchunk_all_offmap_chunk():
    """A chunk where one detector is entirely off-map."""
    n_y = n_x = 32
    iy, ix, data = _scene(n_det=16, n_t=256, n_y=32, n_x=32, off_map_frac=0.0, seed=6)
    iy[3, 64:128] = -1
    ix[3, 64:128] = -1
    iy[5, :] = -1
    ix[5, :] = -1
    plan = make_runchunk_bin_plan_on_device(
        jnp.asarray(iy), jnp.asarray(ix), n_y, n_x, chunk=64, det_block=8,
        max_window_frac=1.01,
    )
    assert plan is not None
    got = np.asarray(bin_runchunk(jnp.asarray(data), plan))
    ref = _oracle(data, iy, ix, n_y, n_x)
    np.testing.assert_allclose(got, ref, atol=2e-5 * float(np.abs(ref).max()))


def _project_oracle(maps, iy, ix):
    """Gather oracle: sample <- maps[f, iy, ix], 0 off-map."""
    valid = (iy >= 0) & (ix >= 0)
    out = np.zeros((maps.shape[0],) + iy.shape, np.float64)
    for f in range(maps.shape[0]):
        out[f][valid] = maps[f].astype(np.float64)[iy[valid], ix[valid]]
    return out


@pytest.mark.parametrize(
    "chunk,det_block,seg", [(64, 32, 64), (128, 96, 32), (256, 48, 256)]
)
def test_project_runchunk_matches_gather(chunk, det_block, seg):
    """P through the run plan == the elementwise gather, original det
    order, off-map samples -> 0, padded tail chunks handled."""
    from maria_tpu.ops.binning_runs import project_runchunk

    n_y = n_x = 64
    iy, ix, _ = _scene(n_t=1000 if chunk < 256 else 1100)
    plan = make_runchunk_bin_plan_on_device(
        jnp.asarray(iy), jnp.asarray(ix), n_y, n_x, chunk=chunk,
        det_block=det_block, seg=seg, max_window_frac=1.01,
    )
    assert plan is not None
    rng = np.random.default_rng(11)
    maps = (50.0 * rng.standard_normal((3, n_y, n_x))).astype(np.float32)
    got = np.asarray(jax.jit(
        lambda m, e, ly, lx, o: project_runchunk(
            m, plan, e_idx=e, run_ly=ly, run_lx=lx, origins=o)
    )(jnp.asarray(maps), *plan.device_args()[:4]))
    ref = _project_oracle(maps, iy, ix)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=3e-5 * float(np.abs(maps).max()))
    # exact zeros off-map (no residue for the CG operand)
    off = (iy < 0) | (ix < 0)
    assert np.all(got[:, off] == 0.0)


def test_project_runchunk_single_map_and_offmap_rows():
    """2-D input squeeze + a fully off-map detector row."""
    from maria_tpu.ops.binning_runs import project_runchunk

    n_y = n_x = 32
    iy, ix, _ = _scene(n_det=16, n_t=256, n_y=32, n_x=32, off_map_frac=0.05, seed=6)
    iy[5, :] = -1
    ix[5, :] = -1
    plan = make_runchunk_bin_plan_on_device(
        jnp.asarray(iy), jnp.asarray(ix), n_y, n_x, chunk=64, det_block=8,
        max_window_frac=1.01,
    )
    assert plan is not None
    rng = np.random.default_rng(12)
    m = rng.standard_normal((n_y, n_x)).astype(np.float32)
    got = np.asarray(project_runchunk(jnp.asarray(m), plan))
    ref = _project_oracle(m[None], iy, ix)[0]
    np.testing.assert_allclose(got, ref, atol=3e-5 * float(np.abs(m).max()))
    assert np.all(got[5] == 0.0)


def test_runchunk_band_stable_order_and_plan_order_data():
    """order_groups keeps rows inside their band slices, and feeding
    data ALREADY in plan order with data_in_plan_order=True gives the
    same map as the gathering path and the f64 scatter oracle."""
    n_y = n_x = 64
    iy, ix, data = _scene(n_det=96, seed=5)
    groups = [(0, 40), (40, 96)]
    plan = make_runchunk_bin_plan_on_device(
        jnp.asarray(iy), jnp.asarray(ix), n_y, n_x, chunk=64, det_block=32,
        max_window_frac=1.01, order_groups=groups,
    )
    assert plan is not None
    order = plan.order[:96]
    # band-stable: every row stays inside its group
    assert set(order[:40]) == set(range(40))
    assert set(order[40:96]) == set(range(40, 96))

    ref = _oracle(data, iy, ix, n_y, n_x)
    via_gather = np.asarray(jax.jit(
        lambda d, e, ly, lx, o, od, w: bin_runchunk(
            d, plan, e_idx=e, run_ly=ly, run_lx=lx, origins=o, order=od, wcnt=w)
    )(jnp.asarray(data), *plan.device_args()))
    via_plan_order = np.asarray(jax.jit(
        lambda d, e, ly, lx, o, od, w: bin_runchunk(
            d, plan, e_idx=e, run_ly=ly, run_lx=lx, origins=o, order=od, wcnt=w,
            data_in_plan_order=True)
    )(jnp.asarray(data[order]), *plan.device_args()))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(via_gather, ref, atol=2e-5 * scale)
    np.testing.assert_array_equal(via_plan_order, via_gather)


def test_program_permute_detectors_matches_plan_order():
    """A band-stable-permuted program emits the permuted TOD of the
    same process: signal rows equal the unpermuted program's rows under
    the permutation (noise/gain streams follow the row index, so they
    are compared per-path with noise disabled)."""
    import maria_tpu
    from maria_tpu.ops.program import build_tod_program

    plan_obj = maria_tpu.get_plan(
        "stare", start_time=1.75e9, scan_center=(150.0, 40.0), frame="az/el",
        duration=10.0, sample_rate=20.0,
    )
    sim = maria_tpu.Simulation(
        instrument="MUSTANG-2", plans=plan_obj, site="GBT", atmosphere="2d",
        noise=False, seed=0,
    )
    program = build_tod_program(sim.obs_list[0], with_noise=False)
    key = jax.random.key(9)

    def atm(p):
        return np.asarray(jax.jit(
            lambda k, o, a, e, tb: p._loadings(k, o, a, e, upto="atmosphere", tables=tb)
        )(*p.example_args(key), p.device_tables())["atmosphere"])

    base = atm(program)
    rng = np.random.default_rng(1)
    n_det = len(program.offsets)
    perm = rng.permutation(n_det)  # single band -> any perm is band-stable
    program.permute_detectors(perm)
    permuted = atm(program)
    # the atmosphere field is a deterministic function of the detector's
    # pointing (gain/noise streams follow the ROW index and are excluded),
    # so row i of the permuted program == row perm[i] unpermuted
    np.testing.assert_allclose(permuted, base[perm], rtol=2e-6, atol=1e-4)
