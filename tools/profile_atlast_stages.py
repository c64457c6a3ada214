"""Lean per-stage on-chip profile of the AtLAST-50k 3-D pipeline.

Unlike tools/profile_atlast.py (chained-marginal timing, 8 compiles),
this times each pipeline prefix NAIVELY with one compile each (4 total):
at AtLAST scale the per-stage device times are hundreds of ms, so the
~28 ms tunnel readback RTT is a small, disclosed bias. Use this when
the compile budget is the constraint (the remote axon compiler pays
minutes per AtLAST-scale program).

Stages (nested prefixes of TODProgram._loadings):
  pwv        — pointing + 3-D screen synthesis + windowed LOS sampling
  atmosphere — + per-band (pwv, el) power tables + cubic upsample
  total      — + noise synthesis + gains
  binning    — + blocked MXU map binning

Memory note: the BATCH program holds ~4 fine-rate (n_det, n_t) buffers;
50k dets x 600 s @ 50 Hz needs ~27 GB and OOMs a 16 GB chip (that long
runs stream: ops/streaming_exec.py). Default duration 240 s fits.

Usage (SOLO on the tunnel): timeout 1800 python tools/profile_atlast_stages.py
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=240.0)
    ap.add_argument("--instrument", default="AtLAST-50k")
    ap.add_argument("--site", default="ALMA")
    ap.add_argument("--atmosphere", default="3d")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--trace", default=None)
    args = ap.parse_args()

    import bench
    import jax
    import jax.numpy as jnp

    bench._enable_compile_cache()
    t0 = time.time()

    def stamp(msg):
        print(f"[stages +{time.time()-t0:.0f}s] {msg}", file=sys.stderr, flush=True)

    program, obs = bench.build_program(
        instrument=args.instrument, site=args.site, duration=args.duration,
        radius=0.5, speed=0.25, atmosphere=args.atmosphere,
    )
    n_det, n_t = len(program.offsets), len(program.t_fine)
    stamp(f"scene built: {n_det} det x {n_t} t ({len(program.t_coarse)} coarse), "
          f"platform {jax.default_backend()}")

    prog_args = program.example_args()
    tables = program.device_tables()

    from maria_tpu.ops.binning import bin_blocked, bin_scatter, make_blocked_bin_plan_on_device
    from maria_tpu.ops.binning_runs import bin_runchunk, make_runchunk_bin_plan_on_device

    iy, ix, n_pix = bench._pixel_ids_device(program, obs)
    rplan = make_runchunk_bin_plan_on_device(iy, ix, 128, 128,
                                             order_groups=program.band_bounds())
    in_plan_order = False
    if rplan is not None and program.band_bounds() is not None:
        # mirror bench_tpu: the program emits det-blocked TOD, binning
        # consumes it with no row-gather relayout
        program.permute_detectors(rplan.order[:len(program.offsets)])
        in_plan_order = True
        prog_args = program.example_args()
        tables = program.device_tables()
    plan = rplan if rplan is not None else make_blocked_bin_plan_on_device(iy, ix, 128, 128)
    if plan is not None:
        plan_args = plan.device_args()
    else:  # narrow/tiny scenes: fall back to the scatter path
        plan_args = (iy * 128 + ix).ravel()
    # free the int32 id buffers (4.8 GB at this scale) before the stage
    # programs allocate — only the plan's int8 ly/lx are needed now
    del iy, ix
    stamp("binning plan built (on device)")

    def reduce_out(out):
        vals = out.values() if isinstance(out, dict) else [out]
        return sum(jnp.sum(v) for v in vals)

    def stage_fn(upto):
        if upto == "binning":
            total_fn = program.total_power_fn()

            def fn(key, offsets, bs_az, bs_el, bin_args, tables):
                tod = total_fn(key, offsets, bs_az, bs_el, tables=tables)
                if rplan is not None:
                    e, rly, rlx, origins, order, wcnt = bin_args
                    binned = bin_runchunk(tod, rplan, e_idx=e, run_ly=rly, run_lx=rlx,
                                          origins=origins, order=order, wcnt=wcnt,
                                          data_in_plan_order=in_plan_order)
                elif plan is not None:
                    ly, lx, origins, order = bin_args
                    binned = bin_blocked(tod, plan, ly=ly, lx=lx, origins=origins, order=order)
                else:
                    binned = bin_scatter(tod, bin_args, n_pix)
                return jnp.sum(tod) + jnp.sum(binned)

            return jax.jit(fn)

        if upto == "total":
            total_fn = program.total_power_fn()

            def fn(key, offsets, bs_az, bs_el, bin_args, tables):
                return jnp.sum(total_fn(key, offsets, bs_az, bs_el, tables=tables))

            return jax.jit(fn)

        def fn(key, offsets, bs_az, bs_el, bin_args, tables):
            return reduce_out(
                program._loadings(key, offsets, bs_az, bs_el, upto=upto, tables=tables)
            )

        return jax.jit(fn)

    results = {}
    costs = {}
    for name in ("pwv", "atmosphere", "total", "binning"):
        tc = time.time()
        # AOT-compile so the timed executable also yields XLA's own
        # post-fusion cost model (flops / HBM bytes; scan bodies counted
        # once, so these are lower bounds — see bench.speed_of_light)
        f = stage_fn(name).lower(*prog_args, plan_args, tables).compile()
        costs[name] = bench._executable_cost(f)
        float(np.asarray(f(*prog_args, plan_args, tables)))
        stamp(f"{name}: compiled+warm in {time.time()-tc:.0f}s")
        times = []
        for i in range(args.repeats):
            fresh = (jax.random.key(i + 1), *prog_args[1:])
            s = time.perf_counter()
            float(np.asarray(f(*fresh, plan_args, tables)))
            times.append(time.perf_counter() - s)
        results[name] = min(times)
        stamp(f"{name}: {results[name]*1e3:.1f} ms")

    if args.trace:
        f = stage_fn("binning")
        with jax.profiler.trace(args.trace):
            float(np.asarray(f(jax.random.key(99), *prog_args[1:], plan_args, tables)))
        stamp(f"trace written to {args.trace}")

    per_tod = results["binning"]
    rate = n_det * n_t / per_tod
    marg = {
        "pwv_ms": round(results["pwv"] * 1e3, 1),
        "bandpass_upsample_ms": round((results["atmosphere"] - results["pwv"]) * 1e3, 1),
        "noise_gains_ms": round((results["total"] - results["atmosphere"]) * 1e3, 1),
        "binning_ms": round((results["binning"] - results["total"]) * 1e3, 1),
        "total_ms": round(per_tod * 1e3, 1),
    }
    roofline = bench.roofline_estimate(program, per_tod)
    # XLA-cost speed-of-light: prefix-delta flops/bytes per stage over the
    # measured marginal time (lower bounds; see bench.speed_of_light)
    prefix = ["pwv", "atmosphere", "total", "binning"]
    stage_sol = {}
    if all(costs.get(n) for n in prefix):
        deltas = {"pwv": (costs["pwv"], results["pwv"])}
        for prev, name in zip(prefix, prefix[1:]):
            deltas[name] = (
                {k: costs[name][k] - costs[prev][k] for k in costs[name]},
                results[name] - results[prev],
            )
        for name, (c, t) in deltas.items():
            sol = bench.speed_of_light(c, t) if t > 1e-4 else None
            if sol:
                stage_sol[name] = {k: sol[k] for k in
                                   ("xla_hbm_gb_per_tod", "sol_s_per_tod", "sol_frac", "bound_by")}
    sol_total = bench.speed_of_light(costs.get("binning"), per_tod)
    print(json.dumps({
        "metric": f"{args.instrument} {args.atmosphere} {args.duration:.0f}s per-stage profile (naive timing incl. ~28ms RTT per dispatch)",
        "n_det": n_det, "n_t": n_t, "n_coarse": len(program.t_coarse),
        "samples_per_s": round(rate, 1),
        "stage_breakdown_ms": marg,
        "roofline": roofline,
        "stage_sol": stage_sol or None,
        "speed_of_light": sol_total,
        "platform": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
