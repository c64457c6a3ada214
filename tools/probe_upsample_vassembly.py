"""Microbench two AtLAST-scale suspects on chip (run SOLO):

1. the phase-stencil upsample: the einsum "k...c,kr->...cr" is a K=4,
   N=ratio dot_general — a terrible MXU shape if XLA lowers it there
   (N=5 pads to 128). Compare a phase-major VPU formulation
   (ratio small weighted sums stacked on the last axis).
2. the noise V-assembly: probe_noise_matmul showed draw 4.7 + matmul
   5.2 but full 13.9 ms — ~4 ms in the scale/concat/cast producer of
   V. Compare f32 draw -> scale -> cast (current) vs bf16-native
   draw+scale.

Usage: timeout 900 python tools/probe_upsample_vassembly.py
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

    n_det, n_c, ratio = 50004, 600, 5
    n_fine = 3000
    k_chain = 9
    rtt = bench.measure_dispatch_rtt()
    stamp(f"rtt {rtt*1e3:.1f} ms")

    def timed_chain(body):
        def run(key):
            def step(c, k):
                return c + body(k), ()
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

    from maria_tpu.ops.interp import _phase_stencil_matrix, upsample_time_phases

    C = np.asarray(_phase_stencil_matrix(ratio, "cubic"), np.float32)  # (4, ratio)

    def coarse_of(k):
        return jax.random.normal(k, (n_det, n_c), jnp.float32)

    # (a) current einsum path
    t_cur = timed_chain(lambda k: jnp.sum(
        upsample_time_phases(coarse_of(k), ratio, n_fine, kind="cubic")))
    stamp(f"upsample einsum (current): {t_cur*1e3:.2f} ms")

    # (b) phase-major VPU: out[..., c, r] = sum_k C[k, r] * tap_k[..., c]
    def phase_major(values):
        pad = jnp.concatenate([values[..., :1], values, values[..., -1:]], axis=-1)
        taps = [pad[..., :-3], pad[..., 1:-2], pad[..., 2:-1], pad[..., 3:]]
        cols = [sum(jnp.float32(C[kk, r]) * taps[kk] for kk in range(4))
                for r in range(ratio)]
        out = jnp.stack(cols, axis=-1).reshape(values.shape[0], (values.shape[-1] - 1) * ratio)
        deficit = n_fine - out.shape[-1]
        tail = jnp.repeat(values[..., -1:], deficit, axis=-1)
        return jnp.concatenate([out, tail], axis=-1)

    t_pm = timed_chain(lambda k: jnp.sum(phase_major(coarse_of(k))))
    stamp(f"upsample phase-major: {t_pm*1e3:.2f} ms")

    # (b2) repeat-major: out[d, t] = sum_k C[k, t%r] * tap_k[d, t//r] as
    # elementwise ops on repeat-broadcast taps — row-major output with
    # NO stack interleave (XLA materialized the stack in a d-minor
    # layout and paid a ~2.6 ms reshape copy in-program)
    def repeat_major(values):
        pad = jnp.concatenate([values[..., :1], values, values[..., -1:]], axis=-1)
        taps = [pad[..., :-3], pad[..., 1:-2], pad[..., 2:-1], pad[..., 3:]]
        n_cm1 = values.shape[-1] - 1
        out = 0.0
        for kk in range(4):
            cvec = jnp.asarray(np.tile(C[kk], n_cm1), jnp.float32)
            out = out + jnp.repeat(taps[kk], ratio, axis=-1) * cvec
        deficit = n_fine - n_cm1 * ratio
        tail = jnp.repeat(values[..., -1:], deficit, axis=-1)
        return jnp.concatenate([out, tail], axis=-1)

    t_rm = timed_chain(lambda k: jnp.sum(repeat_major(coarse_of(k))))
    stamp(f"upsample repeat-major: {t_rm*1e3:.2f} ms")
    # and a consumer-fusion probe: multiply into a resident fine array
    fine = jnp.ones((n_det, n_fine), jnp.float32)
    t_pm_c = timed_chain(lambda k: jnp.sum(phase_major(coarse_of(k)) * fine))
    t_rm_c = timed_chain(lambda k: jnp.sum(repeat_major(coarse_of(k)) * fine))
    stamp(f"with consumer: phase-major {t_pm_c*1e3:.2f} ms, repeat-major {t_rm_c*1e3:.2f} ms")
    v2 = jax.random.normal(jax.random.key(8), (128, n_c), jnp.float32)
    a2 = np.asarray(phase_major(v2))
    b2 = np.asarray(repeat_major(v2))
    stamp(f"repeat-major max abs err vs phase-major: {np.abs(a2-b2).max():.2e}")

    # equality check (same input)
    v = jax.random.normal(jax.random.key(7), (128, n_c), jnp.float32)
    a = np.asarray(upsample_time_phases(v, ratio, n_fine, kind="cubic"))
    b = np.asarray(phase_major(v)[:, :n_fine])
    err = float(np.abs(a - b).max())
    stamp(f"phase-major max abs err vs einsum: {err:.2e}")

    # --- V assembly variants ------------------------------------------
    m1 = 1537
    c_np = np.linspace(1.0, 2.0, m1).astype(np.float32)
    n_bands, per = 9, n_det // 9

    def v_current(k):
        parts = []
        for i in range(n_bands):
            z = jax.random.normal(jax.random.fold_in(k, i),
                                  (per, 2, m1), jnp.float32)
            parts.append((z * jnp.asarray(c_np)).reshape(per, 2 * m1))
        return jnp.sum(jnp.concatenate(parts, 0).astype(jnp.bfloat16).astype(jnp.float32))

    t_vc = timed_chain(v_current)
    stamp(f"V assembly, f32 draw -> scale -> cast (current): {t_vc*1e3:.2f} ms")

    def v_bf16(k):
        parts = []
        cb = jnp.asarray(c_np, jnp.bfloat16)
        for i in range(n_bands):
            z = jax.random.normal(jax.random.fold_in(k, i),
                                  (per, 2, m1), jnp.bfloat16)
            parts.append((z * cb).reshape(per, 2 * m1))
        return jnp.sum(jnp.concatenate(parts, 0).astype(jnp.float32))

    t_vb = timed_chain(v_bf16)
    stamp(f"V assembly, bf16-native draw+scale: {t_vb*1e3:.2f} ms")

    # single whole-axis draw (one threefry op), per-row scale table read
    W = jnp.asarray(np.tile(c_np, (2, 1))[None], jnp.bfloat16)  # (1, 2, m1)

    def v_single(k):
        z = jax.random.normal(k, (n_det, 2, m1), jnp.bfloat16)
        return jnp.sum((z * W).reshape(n_det, 2 * m1).astype(jnp.float32))

    t_vs = timed_chain(v_single)
    stamp(f"V assembly, one draw + broadcast scale: {t_vs*1e3:.2f} ms")

    print({"rtt_ms": rtt * 1e3, "ups_einsum_ms": t_cur * 1e3,
           "ups_phase_major_ms": t_pm * 1e3, "ups_err": err,
           "v_current_ms": t_vc * 1e3, "v_bf16_ms": t_vb * 1e3,
           "v_single_ms": t_vs * 1e3})


if __name__ == "__main__":
    main()
