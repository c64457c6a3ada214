"""Cross-check the CPU baseline against the REAL reference package.

Every published speedup ("718x") is measured against bench.py's own
single-threaded numpy reimplementation of the reference's algorithm,
because `import maria` fails in this offline image (astropy/healpy/dask
are absent). This script runs the actual reference on the same headline
config the moment an environment can import it — so the qualifier on
the speedup can be replaced by a measured number.

Offline it prints {"status": "skipped"} and exits 0.

Usage: python tools/bench_reference_maria.py [--duration 60]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=60.0)
    args = ap.parse_args()

    try:
        import maria  # noqa: F401 — the REAL reference package
    except Exception as e:  # noqa: BLE001
        print(json.dumps({
            "metric": "reference maria TOD samples/s (MUSTANG-2 daisy, 2d atmosphere + noise)",
            "status": "skipped",
            "reason": f"cannot import maria: {type(e).__name__}: {e}"[:200],
        }))
        return

    # the same headline config as bench.py / BASELINE.md (a)
    plan = maria.get_plan(
        "daisy_5arcmin_60s",
        start_time=1.75e9,
        scan_center=(150.0, 41.0),
        frame="az/el",
        duration=args.duration,
        sample_rate=50.0,
        scan_options={"radius": 0.083, "speed": 0.017},
    )
    sim = maria.Simulation(
        instrument="MUSTANG-2", plans=plan, site="green_bank", atmosphere="2d", noise=True
    )
    # warm any data fetches / lazy setup outside the timing
    t0 = time.time()
    tod = sim.run()[0]
    elapsed = time.time() - t0
    n_samples = int(tod.signal.size)
    print(json.dumps({
        "metric": "reference maria TOD samples/s (MUSTANG-2 daisy, 2d atmosphere + noise)",
        "value": round(n_samples / elapsed, 1),
        "unit": "samples/s",
        "n_samples": n_samples,
        "wall_s": round(elapsed, 2),
        "note": "includes the reference's per-run setup inside run() (AR covariance factorization is in __init__, excluded), matching bench_cpu_baseline's timed region as closely as the reference's structure allows",
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — always one JSON line
        import traceback

        traceback.print_exc(file=sys.stderr)
        print(json.dumps({"metric": "reference maria TOD samples/s", "status": "error",
                          "reason": f"{type(e).__name__}: {e}"[:300]}))
        sys.exit(0)


