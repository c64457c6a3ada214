"""Probe the MUSTANG-2 headline's realization-batch sweet spot (the
auto pick is 16). Run SOLO: one compile per batch size.

Usage: timeout 1200 python tools/probe_headline_batch.py [batches...]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import bench

    bench._enable_compile_cache()
    batches = [int(a) for a in sys.argv[1:]] or [16, 32, 64]
    t0 = time.time()

    def stamp(msg):
        print(f"[probe +{time.time()-t0:.0f}s] {msg}", file=sys.stderr, flush=True)

    out = {}
    for b in batches:
        # fresh program per size: bench_tpu permutes the detector axis
        # in place to the binning plan's order
        program, obs = bench.build_program()
        rate = bench.bench_tpu(program, obs, batch=b)
        out[b] = rate
        stamp(f"batch {b}: {rate:.3e} samples/s")
    print(out)


if __name__ == "__main__":
    main()
