"""Op-level attribution of the windowed group sampler on-chip.

Captures a jax.profiler trace of `_sample_group_windowed` at the real
AtLAST group geometry and prints the top device ops by self time — the
60 s stage has measured FLAT (~55-60 ms) across chunk size, hat/ramp
weight form, per-layer vs max windows, and bf16/f32, so the bound is
something invariant; this finds it instead of guessing.

Usage: timeout 1500 python tools/trace_sampler.py [--duration 60]
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def summarize_trace(trace_dir: str, top: int = 25):
    import jax.profiler as jprof

    files = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not files:
        print(f"[trace] no xplane files under {trace_dir}", file=sys.stderr)
        return
    data = jprof.ProfileData.from_file(files[-1])
    for plane in data.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        by_op = collections.Counter()
        total = 0.0
        for line in plane.lines:
            lname = line.name.lower()
            # XLA op lines carry per-op events; skip host/step lines
            if "xla op" not in lname and "ops" != lname and "xla" not in lname:
                continue
            for ev in line.events:
                dur = ev.duration_ns
                by_op[ev.name] += dur
                total += dur
        if not by_op:
            continue
        print(f"\n=== plane: {plane.name} (total op-ns {total:.3e}) ===")
        for name, ns in by_op.most_common(top):
            print(f"{ns/1e6:9.3f} ms  {100*ns/max(total,1):5.1f}%  {name[:140]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=60.0)
    ap.add_argument("--trace-dir", default="/tmp/trace_sampler")
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()

    if args.parse_only:
        summarize_trace(args.trace_dir)
        return

    import bench
    import jax
    import jax.numpy as jnp

    bench._enable_compile_cache()

    program, obs = bench.build_program(
        instrument="AtLAST-50k", site="ALMA", duration=args.duration,
        radius=0.5, speed=0.25, atmosphere="3d",
    )
    g = program.groups[0]
    n_det, n_tc = len(program.offsets), len(program.t_coarse)
    print(f"[trace] grid {g.ny}x{g.nx}, n_det {n_det}, n_tc {n_tc}", file=sys.stderr)

    from maria_tpu.atmosphere.sampling import _sample_group_windowed

    rng = np.random.default_rng(0)
    stack = jnp.asarray(rng.standard_normal((len(g.heights), g.ny, g.nx)).astype(np.float32))
    px = jnp.asarray(rng.uniform(-0.1, 0.1, (n_det, 1)).astype(np.float32) + np.zeros((1, n_tc), np.float32))
    py = jnp.asarray(rng.uniform(-0.1, 0.1, (n_det, 1)).astype(np.float32) + np.zeros((1, n_tc), np.float32))
    bs = jnp.zeros((n_tc,), jnp.float32)
    t_rel = jnp.asarray(program.t_coarse.astype(np.float32))

    fn = jax.jit(
        lambda stack, px, py, bs, t_rel: _sample_group_windowed(
            stack, g, px, py, bs, jnp.zeros_like(bs), t_rel, bf16=False
        )
    )
    fn(stack, px, py, bs, t_rel).block_until_ready()  # compile outside trace
    s = time.perf_counter()
    fn(stack, px, py, bs, t_rel).block_until_ready()
    print(f"[trace] warm run {1e3*(time.perf_counter()-s):.1f} ms", file=sys.stderr)

    with jax.profiler.trace(args.trace_dir):
        for _ in range(3):
            fn(stack, px, py, bs, t_rel).block_until_ready()

    summarize_trace(args.trace_dir)


if __name__ == "__main__":
    main()
