"""Windowed MXU binning vs the scatter reference
(reference behavior: maria/mappers/bin_mapper.py:100-112)."""

import jax
import jax.numpy as jnp
import numpy as np

from maria_tpu.ops.binning import bin_scatter, bin_windowed, make_windowed_bin_plan


def _daisy_pixels(n_det=50, n_t=700, n_map=96, rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    t = np.arange(n_t) / 50.0
    cx = n_map / 2 + 28 * np.sin(2 * np.pi * t / 20) * np.cos(2 * np.pi * t / 6)
    cy = n_map / 2 + 28 * np.sin(2 * np.pi * t / 20) * np.sin(2 * np.pi * t / 6)
    ix = np.clip((cx[None] + rng.uniform(-4, 4, n_det)[:, None]).astype(np.int32), 0, n_map - 1)
    iy = np.clip((cy[None] + rng.uniform(-4, 4, n_det)[:, None]).astype(np.int32), 0, n_map - 1)
    return iy, ix, n_map


def test_windowed_matches_scatter():
    iy, ix, n_map = _daisy_pixels()
    plan = make_windowed_bin_plan(iy, ix, n_map, n_map, chunk=64)
    assert plan is not None

    rng = np.random.default_rng(1)
    data = rng.standard_normal(iy.shape).astype(np.float32)
    m_w = np.asarray(jax.jit(lambda d: bin_windowed(d, plan))(jnp.asarray(data)))
    pix = jnp.asarray((iy.astype(np.int64) * n_map + ix).ravel().astype(np.int32))
    m_s = np.asarray(bin_scatter(jnp.asarray(data), pix, n_map * n_map)).reshape(n_map, n_map)
    np.testing.assert_allclose(m_w, m_s, atol=1e-4 * max(1.0, np.abs(m_s).max()))


def test_windowed_with_weights():
    iy, ix, n_map = _daisy_pixels(rng_seed=3)
    plan = make_windowed_bin_plan(iy, ix, n_map, n_map, chunk=64)
    rng = np.random.default_rng(2)
    data = rng.standard_normal(iy.shape).astype(np.float32)
    w = rng.uniform(0.5, 2.0, iy.shape).astype(np.float32)
    m_w = np.asarray(bin_windowed(jnp.asarray(data), plan, weights=jnp.asarray(w)))
    pix = jnp.asarray((iy.astype(np.int64) * n_map + ix).ravel().astype(np.int32))
    m_s = np.asarray(bin_scatter(jnp.asarray(data), pix, n_map * n_map, weights=jnp.asarray(w)))
    np.testing.assert_allclose(m_w, m_s.reshape(n_map, n_map), atol=1e-4 * max(1.0, np.abs(m_s).max()))


def test_plan_falls_back_when_windows_cover_map():
    """Wide-field pointing (windows ~ whole map) must return None so
    callers use the scatter path."""
    rng = np.random.default_rng(0)
    iy = rng.integers(0, 64, size=(40, 512)).astype(np.int32)
    ix = rng.integers(0, 64, size=(40, 512)).astype(np.int32)
    assert make_windowed_bin_plan(iy, ix, 64, 64, chunk=64) is None


def test_off_map_samples_are_dropped():
    iy, ix, n_map = _daisy_pixels(n_det=10, n_t=128)
    iy = iy.copy()
    iy[0, :] = -1  # mark detector 0 off-map
    plan = make_windowed_bin_plan(iy, ix, n_map, n_map, chunk=64)
    data = np.ones(iy.shape, dtype=np.float32)
    m = np.asarray(bin_windowed(jnp.asarray(data), plan))
    assert m.sum() == (iy.shape[0] - 1) * iy.shape[1]


def test_runlength_matches_scatter():
    from maria_tpu.ops.binning import bin_runlength, make_runlength_bin_plan

    rng = np.random.default_rng(5)
    n_det, n_t, n_pix = 25, 400, 150
    pix = (np.cumsum(rng.integers(0, 2, size=(n_det, n_t)), axis=-1) + rng.integers(0, 50, (n_det, 1))) % n_pix
    plan = make_runlength_bin_plan(pix, n_pix)
    assert len(plan.starts) < pix.size  # actually compressed
    data = rng.standard_normal((n_det, n_t)).astype(np.float32)
    m_rl = np.asarray(
        bin_runlength(
            jnp.asarray(data), jnp.asarray(plan.starts), jnp.asarray(plan.ends),
            jnp.asarray(plan.run_pix), n_pix,
        )
    )
    m_s = np.asarray(bin_scatter(jnp.asarray(data), jnp.asarray(pix.astype(np.int32)), n_pix))
    np.testing.assert_allclose(m_rl, m_s, atol=1e-4 * max(1.0, np.abs(m_s).max()))
