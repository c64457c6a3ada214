"""Decompose the AtLAST pwv stage (pointing + 3-D synthesis + windowed
LOS sampling) on-chip. Each sub-part timed with a forced scalar
readback (min of 3, subtract rtt_ms).

Usage: timeout 1200 python tools/profile_pwv.py [--duration 240]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=240.0)
    args = ap.parse_args()

    import bench
    import jax
    import jax.numpy as jnp

    bench._enable_compile_cache()

    def timed(f, *a):
        float(np.asarray(f(*a)))
        ts = []
        for _ in range(3):
            s = time.perf_counter()
            float(np.asarray(f(*a)))
            ts.append(time.perf_counter() - s)
        return round(min(ts) * 1e3, 1)

    program, obs = bench.build_program(
        instrument="AtLAST-50k", site="ALMA", duration=args.duration,
        radius=0.5, speed=0.25, atmosphere="3d",
    )
    g = program.groups[0]
    results = {"platform": jax.default_backend(), "grid": [g.ny, g.nx],
               "n_coarse": len(program.t_coarse)}

    results["rtt_ms"] = timed(jax.jit(lambda x: x + 1.0), jnp.float32(0.0))

    key, offsets, bs_az, bs_el = program.example_args()
    tables = program.device_tables()

    from maria_tpu.coords.transforms import offsets_to_phi_theta

    @jax.jit
    def pointing(offsets, bs_az, bs_el):
        pt = offsets_to_phi_theta(offsets[:, None, :], bs_az, bs_el)
        det_az, det_el = pt[..., 0], pt[..., 1]
        el_clip = jnp.clip(det_el, jnp.radians(5.0), jnp.pi / 2)
        cot_el = 1 / jnp.tan(el_clip)
        px = jnp.sin(det_az) * cot_el
        py = jnp.cos(det_az) * cot_el
        return jnp.sum(px) + jnp.sum(py) + jnp.sum(el_clip)

    results["pointing_ms"] = timed(pointing, offsets, bs_az, bs_el)

    from maria_tpu.atmosphere.fourier import synthesize_layered_matern_2d

    @jax.jit
    def synth(key, W, Mc, Ms, beam):
        return jnp.sum(synthesize_layered_matern_2d(key, W, Mc, Ms, beam, g.ny, g.nx))

    results["synthesis_ms"] = timed(
        synth, key, jnp.asarray(g.W), jnp.asarray(g.M_cos), jnp.asarray(g.M_sin),
        jnp.asarray(g.beam),
    )

    # full pwv stage for reference
    @jax.jit
    def pwv_full(key, offsets, bs_az, bs_el, tables):
        out = program._loadings(key, offsets, bs_az, bs_el, upto="pwv", tables=tables)
        return jnp.sum(out["pwv"])

    results["pwv_full_ms"] = timed(pwv_full, key, offsets, bs_az, bs_el, tables)

    # sampling-only: full minus (pointing + synthesis), plus directly:
    # one scan per layer (the production path) with fixed inputs
    from maria_tpu.ops.interp import interp_bilinear_windowed

    n_det, n_tc = len(program.offsets), len(program.t_coarse)
    rng = np.random.default_rng(0)
    stack = jnp.asarray(rng.standard_normal((len(g.heights), g.ny, g.nx)).astype(np.float32))
    px = jnp.asarray(rng.uniform(-0.1, 0.1, (n_det, 1)).astype(np.float32) + np.zeros((1, n_tc), np.float32))
    py = jnp.asarray(rng.uniform(-0.1, 0.1, (n_det, 1)).astype(np.float32) + np.zeros((1, n_tc), np.float32))
    bs = jnp.zeros((n_tc,), jnp.float32)
    t_rel = jnp.asarray(program.t_coarse.astype(np.float32))

    def sample_all(stack, px, py, bs, t_rel):
        total = 0.0
        ca, sa = np.cos(g.angle), np.sin(g.angle)
        for il, h in enumerate(g.heights):
            x = float(h) * px + g.vx * t_rel
            y = float(h) * py + g.vy * t_rel
            tx = ca * x + sa * y
            ty = -sa * x + ca * y
            cx_b = ca * (float(h) * bs + g.vx * t_rel) + sa * (float(h) * bs + g.vy * t_rel)
            cy_b = -sa * (float(h) * bs + g.vx * t_rel) + ca * (float(h) * bs + g.vy * t_rel)
            s = interp_bilinear_windowed(
                stack[il], tx, ty, cx_b, cy_b, g.tx_min, g.res, g.ty_min, g.res,
                int(g.win_x[il]), int(g.win_y[il]),
            )
            total = total + jnp.sum(s)
        return total

    results["sampling_12layers_ms"] = timed(jax.jit(sample_all), stack, px, py, bs, t_rel)

    # production group sampler: f32 vs bf16 hat einsums (+ max deviation)
    from maria_tpu.atmosphere.sampling import _sample_group_windowed

    def group_sample(bf16):
        def f(stack, px, py, bs, t_rel):
            return _sample_group_windowed(
                stack, g, px, py, bs, jnp.zeros_like(bs), t_rel, bf16=bf16
            )
        return jax.jit(f)

    f32_fn, bf16_fn = group_sample(False), group_sample(True)
    results["group_sampler_f32_ms"] = timed(
        lambda *a: jnp.sum(f32_fn(*a)), stack, px, py, bs, t_rel
    )
    results["group_sampler_bf16_ms"] = timed(
        lambda *a: jnp.sum(bf16_fn(*a)), stack, px, py, bs, t_rel
    )
    a = np.asarray(f32_fn(stack, px, py, bs, t_rel))
    b = np.asarray(bf16_fn(stack, px, py, bs, t_rel))
    results["bf16_max_abs_diff"] = float(np.abs(a - b).max())
    results["sample_abs_scale"] = float(np.abs(a).max())

    # static-hat GEMM path vs the per-sample scan path
    def group_sample_static(static):
        def f(stack, px, py, bs, t_rel):
            return _sample_group_windowed(
                stack, g, px, py, bs, jnp.zeros_like(bs), t_rel, static=static
            )
        return jax.jit(f)

    if getattr(g, "hat_static", None) is not None and g.hat_static.any():
        stat_fn, scan_fn = group_sample_static(True), group_sample_static(False)
        results["group_sampler_static_ms"] = timed(
            lambda *a: jnp.sum(stat_fn(*a)), stack, px, py, bs, t_rel
        )
        results["group_sampler_scan_ms"] = timed(
            lambda *a: jnp.sum(scan_fn(*a)), stack, px, py, bs, t_rel
        )
        s = np.asarray(stat_fn(stack, px, py, bs, t_rel))
        results["static_max_abs_diff"] = float(np.abs(s - a).max())
        results["hat_static_layers"] = int(g.hat_static.sum())
    print(json.dumps(results))


if __name__ == "__main__":
    main()
