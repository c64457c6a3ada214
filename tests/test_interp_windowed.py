"""Pin the windowed MXU interpolator against the gather oracle.

`interp_bilinear_windowed` evaluates bilinear samples as hat-weight
window contractions (the MXU form); it must match the 4-corner gather of
`interp_bilinear_uniform`, including out-of-window fill-0 semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np

from maria_tpu.ops.interp import (
    interp_bilinear_uniform,
    interp_bilinear_windowed,
)


def test_windowed_matches_gather_oracle():
    rng = np.random.default_rng(3)
    ny, nx = 40, 56
    n_det, n_t = 11, 37
    x0, dx, y0, dy = -5.0, 1.25, 2.0, 0.75
    values = jnp.asarray(rng.standard_normal((ny, nx)).astype(np.float32))

    # boresight track wandering over the grid; detectors scatter around it
    cx = jnp.asarray((x0 + dx * (nx / 2 + 6 * np.sin(np.linspace(0, 3, n_t)))).astype(np.float32))
    cy = jnp.asarray((y0 + dy * (ny / 2 + 5 * np.cos(np.linspace(0, 2, n_t)))).astype(np.float32))
    off_x = rng.uniform(-3 * dx, 3 * dx, (n_det, 1)).astype(np.float32)
    off_y = rng.uniform(-3 * dy, 3 * dy, (n_det, 1)).astype(np.float32)
    tx = cx[None, :] + jnp.asarray(off_x)
    ty = cy[None, :] + jnp.asarray(off_y)

    got = np.asarray(
        jax.jit(
            lambda v, tx, ty, cx, cy: interp_bilinear_windowed(
                v, tx, ty, cx, cy, x0, dx, y0, dy, wx=12, wy=12, chunk=8
            )
        )(values, tx, ty, cx, cy)
    )
    want = np.asarray(interp_bilinear_uniform(values, tx, ty, x0, dx, y0, dy))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_windowed_out_of_window_is_exact_zero():
    """Points far outside the window get exactly zero hat weight."""
    rng = np.random.default_rng(5)
    ny, nx = 24, 24
    values = jnp.asarray(rng.standard_normal((ny, nx)).astype(np.float32) + 100.0)
    n_t = 9
    cx = jnp.full((n_t,), 12.0, jnp.float32)
    cy = jnp.full((n_t,), 12.0, jnp.float32)
    # one detector far right, one far left, one far up — all outside an
    # 8x8 window centered on the boresight
    tx = jnp.asarray(np.array([[40.0], [-30.0], [12.0]], np.float32)) + jnp.zeros((1, n_t), jnp.float32)
    ty = jnp.asarray(np.array([[12.0], [12.0], [90.0]], np.float32)) + jnp.zeros((1, n_t), jnp.float32)
    got = np.asarray(
        interp_bilinear_windowed(values, tx, ty, cx, cy, 0.0, 1.0, 0.0, 1.0, wx=8, wy=8)
    )
    assert (got == 0.0).all()
