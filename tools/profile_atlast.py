"""Per-stage on-chip profile of the AtLAST-50k 3-D pipeline (VERDICT r2
item #2: find where the time goes at a scale that is not dispatch-bound,
then push the top stages toward the roofline).

Stages timed with the chained-marginal method (bench.py / docs:
naive timings eat the ~28 ms tunnel RTT):

  pwv        — pointing + 3-D screen synthesis (batched rfft2 + MXU kz
               mixing) + windowed LOS sampling, coarse rate
  atmosphere — + per-band (pwv, el) power tables + cubic upsample
  total      — + streaming/FFT noise, gains
  binning    — blocked MXU binning of the realization

Optionally dumps a jax.profiler trace (--trace DIR) for op-level
attribution in XProf/TensorBoard.

Usage (SOLO on the tunnel — a second TPU client blocks):
  timeout 1500 python tools/profile_atlast.py [--duration 600] [--trace /tmp/trace]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=600.0)
    ap.add_argument("--instrument", default="AtLAST-50k")
    ap.add_argument("--site", default="ALMA")
    ap.add_argument("--atmosphere", default="3d")
    ap.add_argument("--trace", default=None)
    ap.add_argument("--k", type=int, default=9, help="chain length for marginal timing")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench
    import jax

    bench._enable_compile_cache()
    t0 = time.time()
    program, obs = bench.build_program(
        instrument=args.instrument, site=args.site, duration=args.duration,
        radius=0.5, speed=0.25, atmosphere=args.atmosphere,
    )
    n_det, n_t = len(program.offsets), len(program.t_fine)
    print(f"[profile +{time.time()-t0:.0f}s] scene built: {n_det} det x {n_t} t "
          f"({len(program.t_coarse)} coarse), platform {jax.default_backend()}",
          file=sys.stderr, flush=True)

    stages = bench.bench_stages(program, n_repeats=args.repeats, k_chain=args.k)
    print(f"[profile +{time.time()-t0:.0f}s] stages: {stages}", file=sys.stderr, flush=True)

    rate = bench.bench_tpu(program, obs, n_repeats=args.repeats, k_chain=args.k)
    per_tod = n_det * n_t / rate
    roofline = bench.roofline_estimate(program, per_tod)

    if args.trace:
        import jax.numpy as jnp

        fn = jax.jit(lambda k, o, a, e, tb: program.total_power_fn()(k, o, a, e, tables=tb))
        a = (*program.example_args(), program.device_tables())
        fn(*a)[0].block_until_ready()  # compile outside the trace
        with jax.profiler.trace(args.trace):
            out = fn(jax.random.key(9), *a[1:])
            jnp.sum(out).block_until_ready()
        print(f"[profile] trace written to {args.trace}", file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": f"{args.instrument} {args.atmosphere} {args.duration:.0f}s per-stage profile",
        "n_det": n_det, "n_t": n_t, "n_coarse": len(program.t_coarse),
        "samples_per_s": round(rate, 1),
        "per_tod_s": round(per_tod, 5),
        "stage_breakdown_ms": stages,
        "roofline": roofline,
        "platform": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
