"""Decompose the streamed AtLAST warm-run time by toggling stages.

Variants (each timed warm, same geometry):
  full        atmosphere + noise + MXU binning (the production path)
  scatter     atmosphere + noise + scatter binning
  no-noise    atmosphere only + MXU binning (program copy with_noise=False)

Differences between variants isolate the binning and noise-cascade
costs; the remainder is the blockwise upsample + dispatch overhead.
Prints one JSON line. Run SOLO on the tunnel.

Usage: python tools/profile_stream_atlast.py [--duration 600]
       [--block-tc 128] [--group 8] [--cpu-smoke]
"""

from __future__ import annotations

import argparse
import copy
import json
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=600.0)
    ap.add_argument("--block-tc", type=int, default=128)
    ap.add_argument("--group", type=int, default=8)
    ap.add_argument("--cpu-smoke", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu_smoke:
        jax.config.update("jax_platforms", "cpu")

    import bench
    from maria_tpu.ops.streaming_exec import StreamingExecutor

    t0 = time.time()

    def stamp(msg):
        print(f"[stream +{time.time()-t0:.0f}s] {msg}", file=sys.stderr, flush=True)

    if args.cpu_smoke:
        program, obs = bench.build_program(duration=min(args.duration, 60.0))
    else:
        program, obs = bench.build_program(
            instrument="AtLAST-50k", site="ALMA", duration=args.duration,
            radius=0.5, speed=0.25, atmosphere="3d",
        )
    key = jax.random.key(0)
    out = {"platform": jax.default_backend(), "duration_s": args.duration,
           "setup_s": None}
    stamp("program built")

    def timed(ex, **kw):
        ex.run(key, group_size=args.group, **kw)  # compile + warm state
        stamp("compiled + warm")
        t = time.time()
        r = ex.run(key, group_size=args.group, **kw)
        return time.time() - t, r

    ex = StreamingExecutor(program, obs, block_tc=args.block_tc)
    out["setup_s"] = round(time.time() - t0, 1)
    out["block_tc"] = ex.block_tc
    stamp(f"executor set up (block_tc {ex.block_tc}, {ex.n_blocks} blocks)")
    mxu = ex._bin_plan is not None and not args.cpu_smoke
    t_full, r = timed(ex, **({} if mxu else {"mxu_binning": False}))
    out["full_s"] = round(t_full, 2)
    out["n_samples"] = r.n_samples
    out["samples_per_s"] = round(r.n_samples / t_full, 1)
    stamp(f"full: {t_full:.2f}s ({r.n_samples / t_full:.3e} samples/s)")

    t_scatter, _ = timed(ex, mxu_binning=False)
    out["scatter_s"] = round(t_scatter, 2)

    p2 = copy.copy(program)
    p2.with_noise = False
    ex2 = StreamingExecutor(p2, obs, block_tc=args.block_tc)
    t_nonoise, _ = timed(ex2, **({} if mxu else {"mxu_binning": False}))
    out["no_noise_s"] = round(t_nonoise, 2)

    # absolute binning cost: same full pipeline with the map
    # accumulation compiled out (trace-time env toggle)
    import os

    os.environ["MARIA_TPU_STREAM_SKIP_BIN"] = "1"
    ex3 = StreamingExecutor(program, obs, block_tc=args.block_tc)
    t_nobin, _ = timed(ex3, mxu_binning=False)
    os.environ.pop("MARIA_TPU_STREAM_SKIP_BIN", None)
    out["no_binning_s"] = round(t_nobin, 2)
    out["binning_cost_s"] = round(t_full - t_nobin, 2)

    out["noise_cost_s"] = round(t_full - t_nonoise, 2)
    out["binning_mxu_vs_scatter_s"] = round(t_scatter - t_full, 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
