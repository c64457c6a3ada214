"""Decompose the matmul-noise total stage on chip: threefry draw vs the
V@B MXU contraction vs the fused whole (noise/dft.py). Run SOLO.

The stage measured ~18 ms per AtLAST-50k x 60 s TOD where the pure
matmul floor is ~5 ms — this tells whether the gap is the VPU threefry
draw (the pallas kernel avoided it with the Mosaic hardware PRNG; an
XLA RngBitGenerator draw would too), the MXU contraction itself, or
fusion overhead.

Usage: timeout 900 python tools/probe_noise_matmul.py
"""

from __future__ import annotations

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import bench

    bench._enable_compile_cache()
    import jax
    import jax.numpy as jnp

    t0 = time.time()

    def stamp(msg):
        print(f"[probe +{time.time()-t0:.0f}s] {msg}", file=sys.stderr, flush=True)

    n_det, n, n_fft = 50004, 3000, 3072
    m1 = n_fft // 2 + 1
    k_chain = 9

    def timed(f, *args):
        fc = jax.jit(f).lower(*args).compile()
        float(np.asarray(fc(*args)))
        times = []
        for _ in range(3):
            s = time.perf_counter()
            float(np.asarray(fc(*args)))
            times.append(time.perf_counter() - s)
        return min(times)

    rtt = bench.measure_dispatch_rtt()
    stamp(f"rtt {rtt*1e3:.1f} ms")

    def chain(body):
        def run(key):
            def step(c, k):
                return c + body(k), ()
            tot, _ = jax.lax.scan(step, jnp.float32(0.0), jax.random.split(key, k_chain))
            return tot
        return run

    key = jax.random.key(0)

    # (a) threefry draw alone
    t_draw = (timed(chain(lambda k: jnp.sum(
        jax.random.normal(k, (n_det, 2, m1), jnp.float32))), key) - rtt) / k_chain
    stamp(f"threefry draw (n_det, 2, m1): {t_draw*1e3:.1f} ms")

    # (a2) rbg draw alone (XLA RngBitGenerator — hardware path on TPU)
    def rbg_draw(k):
        data = jax.random.key_data(k).astype(jnp.uint32).reshape(-1)[:2]
        rk = jax.random.wrap_key_data(
            jnp.concatenate([data, data]), impl="rbg")
        return jnp.sum(jax.random.normal(rk, (n_det, 2, m1), jnp.float32))
    try:
        t_rbg = (timed(chain(rbg_draw), key) - rtt) / k_chain
        stamp(f"rbg draw: {t_rbg*1e3:.1f} ms")
    except Exception as e:  # noqa: BLE001
        stamp(f"rbg draw failed: {e}")
        t_rbg = None

    # (b) bf16 matmul alone, operands resident
    V = jnp.zeros((n_det, 2 * m1), jnp.bfloat16)
    B = jnp.zeros((2 * m1, n), jnp.bfloat16)
    def mm_body(k):
        s = jax.random.uniform(k, ()).astype(jnp.bfloat16)  # defeat CSE
        return jnp.sum(jnp.dot(V + s, B, preferred_element_type=jnp.float32))

    t_mm = (timed(chain(mm_body), key) - rtt) / k_chain
    stamp(f"bf16 (50004,3074)@(3074,3000) matmul (+1 ew pass): {t_mm*1e3:.1f} ms")

    # (c) the full fused stage
    from maria_tpu.noise.dft import NoiseBandSpec, band_half_spectrum, noise_total_matmul

    specs = []
    per = n_det // 9
    for i in range(9):
        start = i * per
        stop = n_det if i == 8 else (i + 1) * per
        specs.append(NoiseBandSpec(start, stop,
                                   c=band_half_spectrum(50.0, 1.0, 1.0, n_fft, corr_prop=0.5),
                                   key_index=i))
    A = jnp.ones((n_det, n), jnp.float32)
    t_full = (timed(chain(lambda k: jnp.sum(noise_total_matmul(
        k, A, specs, n=n, n_fft=n_fft))), key) - rtt) / k_chain
    stamp(f"full noise_total_matmul (9 bands, no corr cols): {t_full*1e3:.1f} ms")

    print({"rtt_ms": rtt * 1e3, "draw_ms": t_draw * 1e3,
           "rbg_ms": None if t_rbg is None else t_rbg * 1e3,
           "matmul_ms": t_mm * 1e3, "full_ms": t_full * 1e3})


if __name__ == "__main__":
    main()
