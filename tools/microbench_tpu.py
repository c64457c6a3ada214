"""On-chip micro-benchmarks for the AtLAST hot blocks.

Decomposes the noise+gains stage (403 ms at AtLAST-240s in
BENCH round 3 profiling) into its primitives, and measures the
candidate fixes:

  - normal-threefry : jax.random.normal under the default threefry2x32
  - normal-rbg      : same under the XLA RngBitGenerator ('rbg') impl
  - irfft           : (n_det, n_f) complex64 -> (n_det, n_fft) f32
  - noise-full      : generate_noise_with_knee at band scale
  - windowed-interp : one layer of the windowed LOS sampler

Each timed with 1 warmup + 3 repeats, min reported. Run SOLO on the
tunnel: timeout 900 python tools/microbench_tpu.py
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def timed(f, *args):
    """f must return a SCALAR; forces a host readback per call (the
    axon relay's block_until_ready does not block, so readback is the
    only reliable fence). Subtract the reported rtt_ms baseline."""
    float(np.asarray(f(*args)))
    times = []
    for _ in range(3):
        s = time.perf_counter()
        float(np.asarray(f(*args)))
        times.append(time.perf_counter() - s)
    return min(times)


def main() -> None:
    import jax
    import jax.numpy as jnp

    n_det, n_t = 50016, 12000
    n_fft = 12288
    n_f = n_fft // 2 + 1
    results = {"platform": jax.default_backend(), "n_det": n_det, "n_fft": n_fft}

    key_tf = jax.random.key(0)
    key_rbg = jax.random.key(0, impl="rbg")

    rtt = jax.jit(lambda x: x + 1.0)
    results["rtt_ms"] = round(timed(rtt, jnp.float32(1.0)) * 1e3, 1)

    draw = jax.jit(lambda k: jnp.sum(jax.random.normal(k, (n_det, n_f, 2), dtype=jnp.float32)))
    results["normal_threefry_ms"] = round(timed(draw, key_tf) * 1e3, 1)
    results["normal_rbg_ms"] = round(timed(draw, key_rbg) * 1e3, 1)

    spec = jax.random.normal(key_tf, (n_det, n_f, 2), dtype=jnp.float32)
    irfft = jax.jit(
        lambda z: jnp.sum(jnp.fft.irfft(jax.lax.complex(z[..., 0], z[..., 1]), n=n_fft, axis=-1))
    )
    results["irfft_ms"] = round(timed(irfft, spec) * 1e3, 1)

    from maria_tpu.ops.fft import irfft_matmul

    irfft_mm = jax.jit(
        lambda z: jnp.sum(irfft_matmul(jax.lax.complex(z[..., 0], z[..., 1]), n=n_fft))
    )
    results["irfft_matmul_ms"] = round(timed(irfft_mm, spec) * 1e3, 1)

    from maria_tpu.noise import generate_noise_with_knee

    for name, k in (("threefry", key_tf), ("rbg", key_rbg)):
        f = jax.jit(
            lambda k: jnp.sum(generate_noise_with_knee(
                k, shape=(n_det, n_t), sample_rate=50.0, knee=0.5
            ))
        )
        results[f"noise_full_{name}_ms"] = round(timed(f, k) * 1e3, 1)

    # split/fold_in overhead sanity for rbg keys
    f = jax.jit(lambda k: jnp.sum(jax.random.normal(jax.random.fold_in(jax.random.split(k, 3)[1], 7), (n_det, n_f, 2))))
    results["rbg_split_fold_normal_ms"] = round(timed(f, key_rbg) * 1e3, 1)

    # one 3-D-group layer of the windowed LOS sampler at AtLAST scale
    from maria_tpu.ops.interp import interp_bilinear_windowed

    n_tc, ny, nx, w = 2400, 1024, 1024, 64
    rng = np.random.default_rng(0)
    values = jnp.asarray(rng.standard_normal((ny, nx)).astype(np.float32))
    cx = jnp.asarray((nx / 2 + 200 * np.sin(np.linspace(0, 9, n_tc))).astype(np.float32))
    cy = jnp.asarray((ny / 2 + 200 * np.cos(np.linspace(0, 9, n_tc))).astype(np.float32))
    tx = cx[None] + jnp.asarray(rng.uniform(-20, 20, (n_det, 1)).astype(np.float32))
    ty = cy[None] + jnp.asarray(rng.uniform(-20, 20, (n_det, 1)).astype(np.float32))
    f = jax.jit(
        lambda v, tx, ty, cx, cy: jnp.sum(interp_bilinear_windowed(
            v, tx, ty, cx, cy, 0.0, 1.0, 0.0, 1.0, w, w
        ))
    )
    results["windowed_interp_1layer_ms"] = round(timed(f, values, tx, ty, cx, cy) * 1e3, 1)

    # blocked binning variants at AtLAST-like scale (50k det x 3000 t)
    import jax.lax

    from maria_tpu.ops.binning import bin_blocked, make_blocked_bin_plan_on_device

    n_bt = 3000
    det_y = rng.uniform(0.1, 0.9, n_det) * 128
    det_x = rng.uniform(0.1, 0.9, n_det) * 128
    t = np.arange(n_bt) / 50.0
    by = jnp.asarray(
        np.clip((det_y[:, None] + 6 * np.sin(2 * np.pi * t / 30)).astype(np.int32), 0, 127)
    )
    bx = jnp.asarray(
        np.clip((det_x[:, None] + 6 * np.cos(2 * np.pi * t / 30)).astype(np.int32), 0, 127)
    )
    plan = make_blocked_bin_plan_on_device(by, bx, 128, 128)
    results["bin_windows"] = [plan.wy, plan.wx] if plan else None
    if plan is not None:
        pa = plan.device_args()
        data = jnp.asarray(rng.standard_normal((n_det, n_bt)).astype(np.float32))
        for name, prec in (
            ("high", jax.lax.Precision.HIGH),
            ("hilo", "hilo"),
            ("default", jax.lax.Precision.DEFAULT),
        ):
            f = jax.jit(
                lambda d, ly, lx, org, order, p=prec: jnp.sum(
                    bin_blocked(d, plan, ly=ly, lx=lx, origins=org, order=order, precision=p)
                )
            )
            results[f"bin_blocked_{name}_ms"] = round(timed(f, data, *pa) * 1e3, 1)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
