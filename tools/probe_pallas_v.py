"""On-chip validation + timing of the Mosaic-PRNG shared-V draw
(ops/pallas_noise.shared_v_pallas): moments, spectral whiteness, PSD of
the resulting noise vs the threefry path, and the V-producer timing.

Usage (SOLO): timeout 1200 python tools/probe_pallas_v.py
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

    from maria_tpu.noise.dft import NoiseBandSpec, band_half_spectrum, noise_total_matmul
    from maria_tpu.ops.pallas_noise import shared_v_pallas

    t0 = time.time()

    def stamp(msg):
        print(f"[probe +{time.time()-t0:.0f}s] {msg}", file=sys.stderr, flush=True)

    n, n_fft = 3000, 3072
    m1 = n_fft // 2 + 1
    n_det = 50004
    c = band_half_spectrum(50.0, 0.5, 1.0, n_fft, corr_prop=0.5)

    # --- statistics of the draw itself --------------------------------
    V = np.asarray(shared_v_pallas(jax.random.key(0), 4096, c), np.float32)
    z = V / np.concatenate([c, c])  # undo the column scale
    stamp(f"draw moments: mean {z.mean():+.4f} std {z.std():.4f} "
          f"skew {float(((z - z.mean())**3).mean() / z.std()**3):+.4f} "
          f"kurt {float(((z - z.mean())**4).mean() / z.std()**4):.4f}")
    assert abs(z.mean()) < 5e-3 and abs(z.std() - 1) < 5e-3
    assert abs(((z - z.mean()) ** 4).mean() / z.std() ** 4 - 3) < 0.05
    # neighbor-column and neighbor-row correlations (PRNG stream safety)
    cc = np.corrcoef(z[:, :-1].ravel(), z[:, 1:].ravel())[0, 1]
    cr = np.corrcoef(z[:-1].ravel(), z[1:].ravel())[0, 1]
    stamp(f"neighbor corr: col {cc:+.5f} row {cr:+.5f}")
    assert abs(cc) < 5e-3 and abs(cr) < 5e-3

    # --- vmap rule: batched == stacked unbatched (exact) ---------------
    keys = jax.random.split(jax.random.key(9), 3)
    Vb = np.asarray(jax.vmap(lambda k: shared_v_pallas(k, 512, c))(keys))
    Vs = np.stack([np.asarray(shared_v_pallas(k, 512, c)) for k in keys])
    np.testing.assert_array_equal(Vb, Vs)
    stamp("vmap(batch=3) == stacked unbatched: exact")

    # --- PSD of the full noise vs the threefry path --------------------
    specs = [NoiseBandSpec(0, 2048, c=c, key_index=0)]

    def psd_of(draw_mode):
        import os

        os.environ["MARIA_TPU_NOISE_DRAW"] = draw_mode
        x = np.asarray(noise_total_matmul(jax.random.key(5), 0.0, specs,
                                          n=n, n_fft=n_fft, shared_c=c,
                                          row_scale=np.ones((2048, 1), np.float32)))
        os.environ.pop("MARIA_TPU_NOISE_DRAW")
        return (np.abs(np.fft.rfft(x, axis=-1)) ** 2).mean(axis=0)

    p_pallas = psd_of("pallas")
    p_three = psd_of("threefry")
    sel = slice(4, n // 2)
    ratio = p_pallas[sel] / p_three[sel]
    stamp(f"PSD ratio pallas/threefry: mean {ratio.mean():.4f} "
          f"min {ratio.min():.3f} max {ratio.max():.3f}")
    assert abs(ratio.mean() - 1) < 0.03

    # --- timing at AtLAST scale ---------------------------------------
    rtt = bench.measure_dispatch_rtt()
    k_chain = 9

    def timed(body):
        def run(key):
            def step(cacc, k):
                return cacc + body(k), ()
            tot, _ = jax.lax.scan(step, jnp.float32(0.0),
                                  jax.random.split(key, k_chain))
            return tot
        fc = jax.jit(run).lower(jax.random.key(0)).compile()
        float(np.asarray(fc(jax.random.key(0))))
        times = []
        for i in range(3):
            s = time.perf_counter()
            float(np.asarray(fc(jax.random.key(i + 1))))
            times.append(time.perf_counter() - s)
        return (min(times) - rtt) / k_chain

    t_pallas = timed(lambda k: jnp.sum(
        shared_v_pallas(k, n_det, c).astype(jnp.float32)))
    stamp(f"pallas V producer: {t_pallas*1e3:.2f} ms")

    def v_three(k):
        z = jax.random.normal(k, (n_det, 2, m1), dtype=jnp.float32)
        return jnp.sum((z * jnp.asarray(c)).reshape(n_det, 2 * m1)
                       .astype(jnp.bfloat16).astype(jnp.float32))

    t_three = timed(v_three)
    stamp(f"threefry V producer: {t_three*1e3:.2f} ms")
    print({"pallas_ms": t_pallas * 1e3, "threefry_ms": t_three * 1e3,
           "psd_ratio_mean": float(ratio.mean())})


if __name__ == "__main__":
    main()
