"""End-to-end differentiability of the fused synthesis program.

The whole hot path is pure jnp under one jit (screens, AR scans, LOS
window sampling, bandpass tables, upsampling), so `jax.grad` flows
through the physics — a capability the reference's per-stage
numpy/scipy pipeline cannot offer (maria/sim/simulation.py:213-247).
The demo application is gradient-based pointing calibration: recover a
detector's focal-plane offset by descending the mismatch between its
synthesized TOD and a reference TOD (same PRNG key -> same turbulence
realization, so the mismatch is purely geometric).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import maria_tpu
from maria_tpu.ops.program import build_tod_program


@pytest.fixture(scope="module")
def tiny_program():
    # mid-elevation daisy: a zenith stare is degenerate for offset
    # gradients (cot(el)=0 kills the LOS projection and the el-clip
    # saturates at the 90-degree boundary)
    sim = maria_tpu.Simulation(
        instrument="test/1deg",
        plans=maria_tpu.get_plan(
            "daisy", start_time=1.75e9, scan_center=(150.0, 50.0), frame="az/el",
            duration=10, sample_rate=20, scan_options={"radius": 0.25, "speed": 0.1},
        ),
        site="green_bank",
        atmosphere="2d",
        noise=False,
        seed=7,
    )
    obs = sim.obs_list[0]
    program = build_tod_program(obs, with_noise=False, noise_kwargs={})
    return program


def test_grad_through_full_synthesis(tiny_program):
    """jax.grad of a TOD functional w.r.t. the detector offsets is
    finite and nonzero — the chain runs through pointing trig, screen
    synthesis, windowed LOS sampling and the bandpass power tables."""
    program = tiny_program
    key, offsets, bs_az, bs_el = program.example_args(jax.random.key(0))
    total_fn = program.total_power_fn()

    def loss(offsets):
        tod = total_fn(key, offsets, bs_az, bs_el)
        return jnp.mean(tod**2)

    g = jax.jit(jax.grad(loss))(offsets)
    g = np.asarray(g)
    assert g.shape == offsets.shape
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0


def test_grad_matches_finite_difference(tiny_program):
    """Directional derivative through the full program agrees with a
    central finite difference. The loss is the calibration mismatch
    against a reference TOD — near-zero at the operating point, so the
    f32 difference is resolved (an absolute-scale loss of ~1e3 pW^2
    drowns any FD step in float32 ULPs)."""
    program = tiny_program
    key, offsets_true, bs_az, bs_el = program.example_args(jax.random.key(1))
    total_fn = program.total_power_fn()
    observed = jax.jit(total_fn)(key, offsets_true, bs_az, bs_el)

    def loss(offsets):
        return jnp.mean((total_fn(key, offsets, bs_az, bs_el) - observed) ** 2)

    rng = np.random.default_rng(0)
    x = offsets_true + jnp.asarray(
        np.radians(0.3 / 60.0) * rng.standard_normal(offsets_true.shape).astype(np.float32)
    )
    v = rng.standard_normal(offsets_true.shape).astype(np.float32)
    v /= np.linalg.norm(v)
    g = np.asarray(jax.jit(jax.grad(loss))(x))
    analytic = float((g * v).sum())
    f = jax.jit(loss)
    # eps sits above the f32 quantization floor of the loss (Delta-f at
    # 1e-6 was ~3 ULPs of the ~1.3e-6 loss and the fd wandered 15%;
    # measured convergence: rel gap 0.022 at 1e-5, 0.006 at 3e-5)
    eps = 2e-5
    fd = (float(f(x + eps * v)) - float(f(x - eps * v))) / (2 * eps)
    assert np.isfinite(analytic) and np.isfinite(fd)
    assert abs(analytic - fd) < 0.1 * (abs(analytic) + abs(fd) + 1e-12), (analytic, fd)


@pytest.mark.slow
def test_gradient_pointing_calibration(tiny_program):
    """Recover an injected focal-plane offset error of one detector by
    gradient descent on the TOD mismatch — gradient-based pointing
    calibration through the full simulator."""
    program = tiny_program
    key, offsets_true, bs_az, bs_el = program.example_args(jax.random.key(2))
    total_fn = program.total_power_fn()
    observed = jax.jit(total_fn)(key, offsets_true, bs_az, bs_el)

    # calibrate ONE detector's offset against its own TOD row (the
    # realistic per-detector pointing-calibration objective; a loss
    # over all rows would drown the one-row signal in the ~1e-7
    # f32 reassociation noise between differently-compiled forwards)
    det = 3
    p_true = offsets_true[det]
    # perturb along eta (dy): for this scene the TOD is steeply
    # informative in dy while dx is nearly flat (the screen's structure
    # along the extrusion axis) — descent recovers the informative
    # component and the loss, which is what calibration promises
    p0 = p_true + jnp.asarray(np.radians(np.array([0.0, -2.0]) / 60.0), dtype=jnp.float32)

    def loss(p):
        offs = offsets_true.at[det].set(p)
        sim_tod = total_fn(key, offs, bs_az, bs_el)
        return jnp.mean((sim_tod[det] - observed[det]) ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss))
    p = p0
    l0 = float(grad_fn(p)[0])
    err0 = float(jnp.linalg.norm(p0 - p_true))
    # normalized descent with backtracking: scale-free in the loss
    eta = 0.3 * err0
    for _ in range(30):
        l, g = grad_fn(p)
        gn = jnp.linalg.norm(g)
        step = p - eta * g / jnp.maximum(gn, 1e-30)
        l_new = float(grad_fn(step)[0])
        if l_new < float(l):
            p = step
            eta *= 1.3
        else:
            eta *= 0.5
    err1 = float(jnp.linalg.norm(p - p_true))
    l_end = float(grad_fn(p)[0])
    assert l_end < 0.3 * l0, (l_end, l0)
    assert err1 < 0.5 * err0, (err1, err0)
