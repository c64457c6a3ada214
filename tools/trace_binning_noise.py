"""XProf op-level attribution of the two largest AtLAST-50k stages
after the round-4 reworks: run-compressed binning (26.9 ms) and the
matmul-noise total (18.3 ms). Prints top device ops by self time.

Usage (SOLO): timeout 1700 python tools/trace_binning_noise.py
"""

from __future__ import annotations

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    import bench
    from trace_sampler import summarize_trace

    bench._enable_compile_cache()
    import jax
    import jax.numpy as jnp

    t0 = time.time()

    def stamp(msg):
        print(f"[trace +{time.time()-t0:.0f}s] {msg}", file=sys.stderr, flush=True)

    program, obs = bench.build_program(
        instrument="AtLAST-50k", site="ALMA", duration=60.0, radius=0.5, speed=0.25,
        atmosphere="3d",
    )
    stamp("scene built")

    from maria_tpu.ops.binning_runs import bin_runchunk, make_runchunk_bin_plan_on_device

    iy, ix, n_pix = bench._pixel_ids_device(program, obs)
    rplan = make_runchunk_bin_plan_on_device(iy, ix, 128, 128,
                                             order_groups=program.band_bounds())
    assert rplan is not None
    program.permute_detectors(rplan.order[:len(program.offsets)])
    plan_args = rplan.device_args()
    del iy, ix
    stamp(f"plan built: chunk {rplan.chunk} seg {rplan.seg} r_max {rplan.r_max} "
          f"window {rplan.wy}x{rplan.wx} blocks {rplan.n_blocks}")

    n_det, n_t = len(program.offsets), len(program.t_fine)
    tod = jax.random.normal(jax.random.key(0), (n_det, n_t), jnp.float32) + 100.0
    tod.block_until_ready()

    k_chain = 9

    def make_binning(precision):
        @jax.jit
        def binning_only(tod, e, rly, rlx, origins, order, wcnt):
            def body(c, i):
                m = bin_runchunk(tod + i.astype(jnp.float32), rplan, e_idx=e, run_ly=rly,
                                 run_lx=rlx, origins=origins, order=order, wcnt=wcnt,
                                 data_in_plan_order=True, precision=precision)
                return c + m.max(), ()
            out, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(k_chain))
            return out
        return binning_only

    binning_only = make_binning("shifted")

    f_bin = binning_only.lower(tod, *plan_args).compile()
    float(np.asarray(f_bin(tod, *plan_args)))
    rtt = bench.measure_dispatch_rtt()
    times = []
    for _ in range(3):
        s = time.perf_counter()
        float(np.asarray(f_bin(tod, *plan_args)))
        times.append(time.perf_counter() - s)
    stamp(f"binning: {(min(times)-rtt)/k_chain*1e3:.2f} ms/TOD (rtt {rtt*1e3:.1f})")
    f_hilo = make_binning("hilo").lower(tod, *plan_args).compile()
    float(np.asarray(f_hilo(tod, *plan_args)))
    times = []
    for _ in range(3):
        s = time.perf_counter()
        float(np.asarray(f_hilo(tod, *plan_args)))
        times.append(time.perf_counter() - s)
    stamp(f"binning hilo: {(min(times)-rtt)/k_chain*1e3:.2f} ms/TOD")
    stamp("binning compiled+warm; tracing")
    with jax.profiler.trace("/tmp/trace_binning"):
        float(np.asarray(f_bin(tod, *plan_args)))
    stamp("binning traced")

    # noise stage
    from maria_tpu.noise.dft import noise_total_matmul

    specs, corr_cols, n_fft, shared_c, row_scale = program._noise_matmul_specs()
    stamp(f"noise specs: shared={'yes' if shared_c is not None else 'no'} "
          f"k_corr={0 if corr_cols is None else corr_cols.shape[-1]}")
    A = tod
    cols = None if corr_cols is None else jnp.asarray(corr_cols)

    @jax.jit
    def noise_only(key, A, cols):
        def body(c, k):
            t = noise_total_matmul(k, A, specs, n=n_t, n_fft=n_fft, corr_cols=cols,
                                   shared_c=shared_c, row_scale=row_scale)
            return c + t.max(), ()
        out, _ = jax.lax.scan(body, jnp.float32(0.0), jax.random.split(key, k_chain))
        return out

    f_noise = noise_only.lower(jax.random.key(1), A, cols).compile()
    float(np.asarray(f_noise(jax.random.key(1), A, cols)))
    times = []
    for _ in range(3):
        s = time.perf_counter()
        float(np.asarray(f_noise(jax.random.key(3), A, cols)))
        times.append(time.perf_counter() - s)
    stamp(f"noise: {(min(times)-rtt)/k_chain*1e3:.2f} ms/TOD")
    stamp("noise compiled+warm; tracing")
    with jax.profiler.trace("/tmp/trace_noise"):
        float(np.asarray(f_noise(jax.random.key(2), A, cols)))
    stamp("noise traced")

    print("\n######## BINNING (9 chained) ########")
    summarize_trace("/tmp/trace_binning", top=20)
    print("\n######## NOISE (9 chained) ########")
    summarize_trace("/tmp/trace_noise", top=20)


if __name__ == "__main__":
    main()
