"""XProf the FULL AtLAST total_power_fn: the in-program noise stage
costs ~20 ms while the isolated noise harness runs 11.3 ms — attribute
the ~9 ms boundary overhead (extra materializations between the
atmosphere prefix and the matmul epilogue?).

Usage (SOLO): timeout 1500 python tools/trace_total_stage.py
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
    args = program.example_args()
    tables = program.device_tables()
    fn = program.total_power_fn()
    k_chain = 5

    @jax.jit
    def total_only(key, offsets, bs_az, bs_el, tables):
        def body(c, k):
            return c + jnp.sum(fn(k, offsets, bs_az, bs_el, tables=tables)), ()
        out, _ = jax.lax.scan(body, jnp.float32(0.0), jax.random.split(key, k_chain))
        return out

    f = total_only.lower(*args, tables).compile()
    float(np.asarray(f(*args, tables)))
    rtt = bench.measure_dispatch_rtt()
    times = []
    for i in range(3):
        s = time.perf_counter()
        float(np.asarray(f(jax.random.key(i + 1), *args[1:], tables)))
        times.append(time.perf_counter() - s)
    stamp(f"total stage: {(min(times)-rtt)/k_chain*1e3:.2f} ms/TOD")
    with jax.profiler.trace("/tmp/trace_total"):
        float(np.asarray(f(jax.random.key(9), *args[1:], tables)))
    stamp("traced")
    print(f"\n######## TOTAL_POWER_FN ({k_chain} chained) ########")
    summarize_trace("/tmp/trace_total", top=28)


if __name__ == "__main__":
    main()
