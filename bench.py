"""North-star benchmark: TOD synthesis throughput (detector x time samples / s).

Config (a) from BASELINE.md: MUSTANG-2 on GBT, daisy scan, 2-D
turbulence, atmosphere TOD synthesis end-to-end on device (screen FFTs,
LOS gathers, PWV upsample, bandpass integration, noise, gains).

`vs_baseline` is measured against a single-threaded numpy
implementation of the reference's algorithm (AR conditional-Gaussian
extrusion + scipy grid interpolation + scipy upsampling — the same
stages CPU maria runs, reimplemented minimally here since the reference
package cannot run in this offline environment). Both timings exclude
one-time setup (covariance factorization / jit compile).

Prints ONE json line: {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Wall-clock budget: the axon tunnel cannot persist compiled executables
# (the PJRT plugin lacks serialization), so every run pays full compile
# for each distinct program (~1-3 min each). Legs run by BASELINE.md
# priority — headline -> AtLAST config (b) -> CPU baseline -> per-stage
# breakdown — each in its own fresh subprocess (relay discipline, see
# _acquire_backend) with its own budget, so a slow compile in one leg
# can never starve a higher-priority number, and each leg streams its
# milestones to a partial file the parent reads even after a kill.
_T0 = time.time()
BENCH_DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", 1080.0))


def _remaining() -> float:
    return BENCH_DEADLINE_S - (time.time() - _T0)


def _stamp(msg: str) -> None:
    print(f"[bench +{time.time() - _T0:.0f}s] {msg}", file=sys.stderr, flush=True)


# Partial results, stashed as each milestone lands so the watchdog can
# report whatever was measured before a mid-run infrastructure wedge.
_PARTIAL: dict = {}

# The subprocess currently holding the device, so the watchdog can kill
# it before exiting (an orphaned child keeps the relay stream open and
# wedges the NEXT session's first readback).
_ACTIVE_CHILD = None

# Serializes the final-JSON print between main() and the watchdog so the
# driver never sees two interleaved result lines.
import threading  # noqa: E402

_PRINT_LOCK = threading.Lock()


def _write_partial(update: dict) -> None:
    """Milestone stream: children append one JSON line per measurement
    to $BENCH_PARTIAL_FILE so the parent recovers everything measured
    even when the child is timeout-killed mid-compile."""
    _PARTIAL.update(update)
    path = os.environ.get("BENCH_PARTIAL_FILE")
    if not path:
        return
    try:
        with open(path, "a") as f:
            f.write(json.dumps(update) + "\n")
    except OSError:
        pass


def _read_partial(path: str) -> dict:
    """Merge the milestone lines a child wrote (later lines win)."""
    out: dict = {}
    try:
        with open(path) as f:
            for line in f:
                try:
                    out.update(json.loads(line))
                except json.JSONDecodeError:
                    continue
    except OSError:
        pass
    return out


def _watchdog_result() -> dict:
    tpu_rate = _PARTIAL.get("tpu_rate")
    cpu_rate = _PARTIAL.get("cpu_rate")
    result = {
        "metric": "TOD samples/sec (MUSTANG-2 daisy, 2d atmosphere + noise + map binning, end-to-end on device)",
        "value": round(tpu_rate, 1) if tpu_rate else 0.0,
        "unit": "samples/s",
        "vs_baseline": round(tpu_rate / cpu_rate, 2) if tpu_rate and cpu_rate else None,
        "platform": _PARTIAL.get("platform"),
        "last_stage": _PARTIAL.get("stage"),
        "atlast_50k_samples_per_s": _PARTIAL.get("atlast_rate"),
        "atlast_roofline": _PARTIAL.get("atlast_roofline"),
        "atlast_stage_breakdown": _PARTIAL.get("atlast_stage_breakdown"),
        "atlast_streamed_600s_samples_per_s": _PARTIAL.get("streamed_rate"),
        "stage_breakdown": _PARTIAL.get("stage_breakdown"),
        "speed_of_light": _PARTIAL.get("speed_of_light"),
    }
    if tpu_rate:
        # the headline was measured on hardware; only whatever legs had
        # not landed by the deadline are missing
        result["note"] = "deadline hit; later legs omitted (see last_stage)"
    else:
        result["error"] = "bench-deadline-wedged"
        result["note"] = (
            "no headline number landed by the soft deadline — either a wedged "
            "relay (BENCH_r02 mode) or a degraded remote-compile server "
            "(2026-08-21 mode: >520 s for a program that compiles in ~45 s "
            "warm); legs may still land after this line and print a better "
            "final result"
        )
    return result


def _start_watchdog(margin_s: float = 60.0) -> None:
    """Print a structured JSON line and exit 0 if main() never finishes.

    A dead axon relay HANGS in-flight device calls (observed 2026-08-20:
    a device_put through an orphaned relay stream never returned), so an
    in-process deadline is the only defense: sleep until margin_s before
    BENCH_DEADLINE_S and, if the final JSON has not printed, emit the
    partial result and hard-exit so the driver records rc=0 with a
    parseable line instead of a timeout. Any still-running device child
    is killed first (an orphan keeps its relay stream open and wedges
    the next session), and the final print is serialized with main()'s
    so the driver never gets two result lines."""

    def body():
        time.sleep(max(5.0, min(_remaining() - margin_s, BENCH_DEADLINE_S)))
        # grace: when the LAST-CHANCE headline retry is in flight (set
        # via _PARTIAL["grace"]), print the partial result NOW as
        # insurance (the driver parses the LAST JSON line, so a better
        # line later supersedes it) and hold the hard exit up to
        # +540 s — an uninterrupted attempt is the only thing that
        # lands on a degraded compile server (2026-08-21: killed
        # attempts do not seed the server cache).
        if _PARTIAL.get("grace") and not _PARTIAL.get("done"):
            with _PRINT_LOCK:
                if not _PARTIAL.get("done"):
                    _stamp("WATCHDOG: deadline reached mid-retry; printing "
                           "insurance partial, granting grace")
                    print(json.dumps(_watchdog_result()), flush=True)
            grace_until = time.time() + 540.0
            while (_PARTIAL.get("grace") and not _PARTIAL.get("done")
                   and time.time() < grace_until):
                time.sleep(10.0)
        with _PRINT_LOCK:
            if _PARTIAL.get("done"):
                return
            _stamp(f"WATCHDOG: deadline reached at stage {_PARTIAL.get('stage')!r}; "
                   "emitting partial result")
            child = _ACTIVE_CHILD
            if child is not None and child.poll() is None:
                try:
                    child.kill()
                    child.wait(timeout=10)
                except Exception:  # noqa: BLE001 — must still print the JSON
                    pass
            print(json.dumps(_watchdog_result()), flush=True)
            os._exit(0)

    threading.Thread(target=body, daemon=True).start()

# persistent XLA compilation cache: the remote-TPU tunnel makes first
# compiles expensive; cache them across processes. Keyed by a machine
# fingerprint so stale cross-machine AOT artifacts are never loaded.
import hashlib  # noqa: E402
import platform  # noqa: E402

try:
    with open("/proc/cpuinfo") as _f:
        _cpu = next((line for line in _f if line.startswith("flags")), "")
except OSError:
    _cpu = platform.processor()
_tag = hashlib.md5((platform.machine() + _cpu).encode()).hexdigest()[:8]
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", f"/tmp/jax-comp-cache-{_tag}")


def _enable_compile_cache():
    # sitecustomize imports jax before this file runs; the env var alone
    # is read too late. (Only CPU programs persist — the axon TPU plugin
    # cannot serialize — but every little helps and it is free.)
    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

DURATION_S = 60.0
SAMPLE_RATE = 50.0


def _acquire_backend(attempts: int = 4, probe_timeout: float = 60.0) -> str:
    """Return the default jax backend, surviving a dead TPU relay.

    The axon tunnel has died mid-round before (BENCH_r02 recorded rc=1
    with a raw traceback). Backend init through a dead relay HANGS
    in-process, so each probe runs in a subprocess under a timeout,
    retried with backoff. If the backend never comes up, force the CPU
    platform for this process (jax.config.update — the env var is read
    too late because sitecustomize imports jax at interpreter start) and
    return 'cpu-fallback' so main() can mark the JSON accordingly.
    """
    import subprocess

    sleeps = [15, 30, 60, 60, 120]
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; print(jax.default_backend())"],
                capture_output=True, text=True, timeout=probe_timeout,
            )
            if r.returncode == 0 and r.stdout.strip():
                # grace period: this relay wedges a NEW client stream
                # opened immediately after another client disconnects
                # (observed 2026-08-20: the parent's first device op
                # after a <1 s-old probe exit blocked forever, while a
                # fresh solo process built fine) — let the probe's
                # stream finish closing before the parent connects
                time.sleep(10)
                return r.stdout.strip()
            _stamp(f"backend probe {i + 1}/{attempts}: rc={r.returncode}")
        except subprocess.TimeoutExpired:
            _stamp(f"backend probe {i + 1}/{attempts}: hung >{probe_timeout:.0f}s")
        if i + 1 < attempts:
            time.sleep(sleeps[min(i, len(sleeps) - 1)])
    _stamp("TPU backend unavailable; falling back to CPU for this run")
    import jax

    jax.config.update("jax_platforms", "cpu")
    return "cpu-fallback"


def build_program(
    instrument="MUSTANG-2", site="GBT", duration=DURATION_S, radius=0.083, speed=0.017,
    atmosphere="2d",
):
    import maria_tpu
    from maria_tpu.ops.program import build_tod_program

    plan = maria_tpu.get_plan(
        "daisy_5arcmin_60s",
        start_time=1.75e9,
        scan_center=(150.0, 41.0),
        frame="az/el",
        duration=duration,
        sample_rate=SAMPLE_RATE,
        scan_options={"radius": radius, "speed": speed},
    )
    sim = maria_tpu.Simulation(
        instrument=instrument, plans=plan, site=site, atmosphere=atmosphere, noise=True, seed=0
    )
    return build_tod_program(sim.obs_list[0], noise_kwargs=sim.noise_kwargs), sim.obs_list[0]


def _pixel_ids(program, obs, n_x: int = 128, n_y: int = 128):
    """Static flattened map-pixel ids per (detector, fine-time) sample —
    pointing is known before the run, so binning inside the benched
    program is a segment-sum over precomputed ids (host setup, untimed)."""
    from maria_tpu.coords.transforms import phi_theta_to_offsets
    from maria_tpu.tod.tod import Pointing

    az, el = Pointing(obs.boresight, obs.offsets, obs.q).det_azel()
    pt = np.stack([np.asarray(az), np.asarray(el)], axis=-1)
    c_az = float(np.mean(np.asarray(obs.boresight.az)))
    c_el = float(np.mean(np.asarray(obs.boresight.el)))
    offs = np.asarray(phi_theta_to_offsets(pt, c_az, c_el))
    half = np.abs(offs).max() * 1.02 + 1e-8
    res = 2 * half / n_x
    ix = np.clip(((offs[..., 0] + half) / res).astype(np.int32), 0, n_x - 1)
    iy = np.clip(((offs[..., 1] + half) / res).astype(np.int32), 0, n_y - 1)
    return iy * n_x + ix, n_x * n_y


def _pixel_ids_device(program, obs, n_x: int = 128, n_y: int = 128):
    """Device-side `_pixel_ids`: returns (iy, ix) int32 DEVICE arrays.

    The host path materializes (n_det, n_t) float64 pointing and walks
    it ~10 times on one core (tens of minutes at AtLAST scale, and a
    multi-GB readback through the development tunnel). Here the
    pointing -> offsets -> pixel-index chain runs jitted on device; the
    host reads back one scalar (the field half-width)."""
    import jax
    import jax.numpy as jnp

    from maria_tpu.coords.transforms import offsets_to_phi_theta, phi_theta_to_offsets

    offsets = jnp.asarray(np.asarray(obs.offsets)[:, None, :], jnp.float32)
    bs_az = jnp.asarray(np.asarray(obs.boresight.az), jnp.float32)
    bs_el = jnp.asarray(np.asarray(obs.boresight.el), jnp.float32)
    c_az = float(np.mean(np.asarray(obs.boresight.az)))
    c_el = float(np.mean(np.asarray(obs.boresight.el)))

    @jax.jit
    def _offs(offsets, bs_az, bs_el):
        pt = offsets_to_phi_theta(offsets, bs_az, bs_el)
        offs = phi_theta_to_offsets(pt, c_az, c_el)
        return offs, jnp.abs(offs).max()

    offs, half_d = _offs(offsets, bs_az, bs_el)
    half = float(half_d) * 1.02 + 1e-8
    res = 2 * half / n_x

    @jax.jit
    def _ids(offs):
        ix = jnp.clip(((offs[..., 0] + half) / res).astype(jnp.int32), 0, n_x - 1)
        iy = jnp.clip(((offs[..., 1] + half) / res).astype(jnp.int32), 0, n_y - 1)
        return iy, ix

    iy, ix = _ids(offs)
    return iy, ix, n_x * n_y


def _executable_cost(compiled) -> dict | None:
    """XLA's own post-fusion cost model for ONE realization: flops and
    HBM bytes accessed of the chain(1) executable.

    Caveat (measured, see repo history): HLO cost analysis counts a
    `scan`/`while` BODY ONCE regardless of trip count, so any stage
    implemented as an internal scan is undercounted — flops/bytes here
    are a LOWER bound, and the derived speed-of-light fraction is
    therefore conservative (true utilization >= reported)."""
    try:
        ca = compiled.cost_analysis()
        d = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(d.get("flops", 0.0))
        hbm_bytes = float(d.get("bytes accessed", 0.0))
        if flops <= 0 and hbm_bytes <= 0:
            return None
        return {"flops": flops, "bytes": hbm_bytes}
    except Exception:  # noqa: BLE001 — cost analysis is best-effort (plugin-dependent)
        return None


def speed_of_light(cost: dict | None, measured_s: float) -> dict | None:
    """Time a perfect v5e implementation of this executable's own
    (post-fusion) work would need: max(flops/peak, bytes/bandwidth).
    `sol_frac` = that floor over the measured time — the honest
    utilization number (1.0 = at the hardware roofline)."""
    if not cost or measured_s <= 0:
        return None
    t_flops = cost["flops"] / (V5E_PEAK_BF16_TFLOPS * 1e12)
    t_hbm = cost["bytes"] / (V5E_HBM_GBPS * 1e9)
    sol_s = max(t_flops, t_hbm)
    return {
        "xla_flops_per_tod": cost["flops"],
        "xla_hbm_gb_per_tod": round(cost["bytes"] / 1e9, 4),
        "sol_s_per_tod": round(sol_s, 6),
        "sol_frac": round(sol_s / measured_s, 4),
        "bound_by": "hbm" if t_hbm >= t_flops else "flops",
        "note": "XLA cost analysis of the compiled (post-fusion) HLO; inner scan bodies counted once, so sol_frac is a lower bound on true utilization",
    }


def measure_dispatch_rtt(n_repeats: int = 7) -> float:
    """The tunnel's fixed dispatch + blocking-readback cost: time a
    trivial jitted scalar program (compiles in seconds, nothing like
    the benched programs) round-trip to host float. Subtracted from
    single-dispatch timings so they measure device work, not the
    development relay (a production host has the chip attached)."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    float(np.asarray(f(x)))  # compile + warm
    times = []
    for _ in range(n_repeats):
        start = time.perf_counter()
        float(np.asarray(f(x)))
        times.append(time.perf_counter() - start)
    return float(np.median(times))


def bench_tpu(program, obs=None, n_repeats: int = 5, k_chain: int = None,
              return_cost: bool = False, batch: int = None) -> float:
    """Samples/s of the fused jitted program on the default jax device,
    including on-device map binning of every realization when `obs` is
    given (the full atmosphere -> TOD -> binned-map pipeline of
    BASELINE.md).

    Measures pipelined throughput: one dispatch synthesizes `k_chain`
    independent TOD realizations via `lax.scan` over PRNG keys, and the
    per-TOD time is (T(k) - rtt) / k with `rtt` the separately measured
    trivial-dispatch round-trip (measure_dispatch_rtt). One compile per
    config: the previous two-point marginal scheme ((T(k) - T(1)) /
    (k - 1)) compiled a second full program purely to cancel the
    ~28 ms tunnel RTT, and that duplicate compile is what starved the
    round-3 driver run (BENCH_r03: 400 s headline leg, AtLAST null).
    Every stage of every realization is still timed — each scan
    iteration computes the full (n_det, n_t) TOD (and its binned map)
    before the reduction that keeps XLA from dropping work.
    """
    import jax
    import jax.numpy as jnp

    pix = plan = plan_args = rplan = None
    in_plan_order = False
    if obs is not None:
        from maria_tpu.ops.binning import make_blocked_bin_plan_on_device
        from maria_tpu.ops.binning_runs import make_runchunk_bin_plan_on_device

        # MXU binning, fastest plan first: run-compressed (3-4x fewer
        # one-hot rows, measured 23.7 ms vs 46.3 ms blocked for
        # AtLAST-50k x 60 s on v5e) -> det-blocked -> scatter as a last
        # resort. Plans are built ON DEVICE — the host path walks the
        # (n_det, n_t) pointing ~10 times on one core and takes tens of
        # minutes at AtLAST scale (it burned the whole BENCH_r02
        # subprocess budget)
        iy, ix, n_pix = _pixel_ids_device(program, obs)
        rplan = make_runchunk_bin_plan_on_device(
            iy, ix, 128, 128, order_groups=program.band_bounds())
        if rplan is not None:
            plan = rplan
            # band-stable plan: permute the program's detector axis so
            # the fused synthesis EMITS det-blocked TOD and binning
            # consumes it with zero row-gather relayout (the gather was
            # ~18 ms of the ~24 ms AtLAST binning stage)
            if program.band_bounds() is not None:
                program.permute_detectors(rplan.order[:len(program.offsets)])
                in_plan_order = True
        else:
            plan = make_blocked_bin_plan_on_device(iy, ix, 128, 128)
        if plan is None:
            pix = (iy * 128 + ix).ravel()
        else:
            # index arrays ride as jit arguments (closure constants of
            # this size blow the remote-compile request limit)
            plan_args = plan.device_args()
        # free the int32 id buffers (4.8 GB at AtLAST-240s scale) before
        # the benched programs allocate their fine-rate fields
        del iy, ix

    fn = program.total_power_fn()
    args = program.example_args()
    tables = program.device_tables()

    n_samples = len(program.offsets) * len(program.t_fine)
    if batch is None:
        # small scenes are per-op-overhead-bound (MUSTANG-2's 2.6 MB
        # stage arrays leave the chip ~80% idle — BENCH_r03 sol_frac
        # 0.22), so independent realizations are vmapped into one fat
        # program: arrays grow `batch`-fold and the fixed per-op costs
        # amortize. Realization count, not problem size: every TOD is
        # still fully synthesized and binned (channel-stacked).
        batch = int(np.clip((1 << 24) // max(n_samples, 1), 1, 16))
    if k_chain is None:
        # bound the chain's device working set: each iteration synthesizes
        # `batch` full (n_det, n_t) TODs, so huge arrays get a shorter
        # chain. Small programs chain deeper so the one-dispatch timing
        # dwarfs RTT jitter.
        k_chain = int(np.clip((1 << 31) // max(4 * n_samples * batch, 1), 8, 128)) + 1

    def make_chain(k_count):
        # NOTE: pix rides as an ARGUMENT — a 50k-detector id array baked
        # in as a closure constant blows the remote-compile request limit
        @jax.jit
        def run(key, offsets, bs_az, bs_el, pix_arg, bin_args, tables):
            def body(carry, k):
                from maria_tpu.ops.binning import bin_blocked, bin_scatter
                from maria_tpu.ops.binning_runs import bin_runchunk

                if batch > 1:
                    keys_b = jax.random.split(k, batch)
                    tod = jax.vmap(
                        lambda kk: fn(kk, offsets, bs_az, bs_el, tables=tables)
                    )(keys_b)  # (batch, n_det, n_t) — channel-stacked below
                else:
                    tod = fn(k, offsets, bs_az, bs_el, tables=tables)
                out = tod.mean()
                if rplan is not None:
                    e, rly, rlx, origins, order, wcnt = bin_args
                    binned = bin_runchunk(tod, rplan, e_idx=e, run_ly=rly, run_lx=rlx,
                                          origins=origins, order=order, wcnt=wcnt,
                                          data_in_plan_order=in_plan_order)
                    out = out + binned.max() / max(len(program.t_fine), 1)
                elif plan is not None:
                    ly, lx, origins, order = bin_args
                    binned = bin_blocked(tod, plan, ly=ly, lx=lx, origins=origins, order=order)
                    out = out + binned.max() / max(len(program.t_fine), 1)
                elif pix_arg is not None:
                    binned = bin_scatter(tod.reshape(-1, tod.shape[-1]) if batch > 1 else tod,
                                         jnp.tile(pix_arg, (batch,)) if batch > 1 else pix_arg,
                                         n_pix)
                    out = out + binned.max() / max(len(program.t_fine), 1)
                return carry + out, ()
            keys = jax.random.split(key, k_count)
            total, _ = jax.lax.scan(body, jnp.float32(0.0), keys)
            return total
        return run

    def compiled_chain(k_count):
        # AOT compile so the SAME executable is timed and cost-analyzed
        # (a separate .lower().compile() would pay a second remote compile)
        return make_chain(k_count).lower(*args, pix, plan_args, tables).compile()

    def timed(f):
        float(np.asarray(f(*args, pix, plan_args, tables)))  # warm up
        times = []
        for i in range(n_repeats):
            fresh = (jax.random.key(i + 1), *args[1:])
            start = time.perf_counter()
            float(np.asarray(f(*fresh, pix, plan_args, tables)))
            times.append(time.perf_counter() - start)
        return min(times)

    rtt = measure_dispatch_rtt()
    chain_k = compiled_chain(k_chain)
    t_k = timed(chain_k)
    per_tod = max(t_k - rtt, 0.2 * t_k) / (k_chain * batch)
    rate = n_samples / per_tod
    if return_cost:
        # the scan body is counted ONCE by HLO cost analysis regardless
        # of trip count (see _executable_cost), so the k-chain's cost is
        # the per-ITERATION cost — divide by the realization batch to
        # get per-TOD
        cost = _executable_cost(chain_k)
        if cost and batch > 1:
            cost = {k: v / batch for k, v in cost.items()}
        return rate, cost
    return rate


def bench_stages(program, n_repeats: int = 3, k_chain: int = None, batch: int = None) -> dict:
    """Marginal per-realization device time of nested pipeline prefixes,
    reported as per-stage milliseconds:

      screens_ar_pwv : pointing + screen synthesis + AR extrusion + LOS
                       sampling to coarse-rate pwv
      bandpass_upsample : + per-band (pwv, el) power tables + time upsample
      noise          : + knee-noise FFT synthesis and gains
      (binning is reported by the main benchmark as total - fields)
    """
    import jax
    import jax.numpy as jnp

    args = program.example_args()
    tables = program.device_tables()

    # the SAME realization batching as bench_tpu, so per-stage times are
    # per-TOD on the same footing as the headline rate (a mismatch makes
    # the derived binning_ms nonsense)
    n_samples = len(program.offsets) * len(program.t_fine)
    if batch is None:
        batch = int(np.clip((1 << 24) // max(n_samples, 1), 1, 16))
    if k_chain is None:
        k_chain = int(np.clip((1 << 31) // max(4 * n_samples * batch, 1), 8, 128)) + 1

    def chain(stage_fn, k_count):
        @jax.jit
        def run(key, offsets, bs_az, bs_el, tables):
            def one(k):
                out = stage_fn(k, offsets, bs_az, bs_el, tables)
                vals = out.values() if isinstance(out, dict) else [out]
                return sum(jnp.sum(v) for v in vals)

            def body(carry, k):
                if batch > 1:
                    return carry + jnp.sum(jax.vmap(one)(jax.random.split(k, batch))), ()
                return carry + one(k), ()

            keys = jax.random.split(key, k_count)
            total, _ = jax.lax.scan(body, jnp.float32(0.0), keys)
            return total

        return run

    rtt = measure_dispatch_rtt()

    def marginal(stage_fn):
        def timed(f):
            float(np.asarray(f(*args, tables)))  # warm
            times = []
            for i in range(n_repeats):
                fresh = (jax.random.key(i + 1), *args[1:])
                start = time.perf_counter()
                float(np.asarray(f(*fresh, tables)))
                times.append(time.perf_counter() - start)
            return min(times)

        # one compile per stage: subtract the trivial-dispatch RTT
        # instead of compiling a second one-trip chain (see bench_tpu)
        ck = chain(stage_fn, k_chain).lower(*args, tables).compile()
        tk = timed(ck)
        cost = _executable_cost(ck)
        if cost and batch > 1:
            cost = {k: v / batch for k, v in cost.items()}
        return max(tk - rtt, 0.2 * tk) / (k_chain * batch), cost

    t_pwv, c_pwv = marginal(lambda k, o, a, e, tb: program._loadings(k, o, a, e, upto="pwv", tables=tb))
    t_atm, c_atm = marginal(lambda k, o, a, e, tb: program._loadings(k, o, a, e, upto="atmosphere", tables=tb))
    t_all, c_all = marginal(lambda k, o, a, e, tb: program.total_power_fn()(k, o, a, e, tables=tb))
    out = {
        "screens_ar_pwv_ms": round(1e3 * max(t_pwv, 0.0), 3),
        "bandpass_upsample_ms": round(1e3 * max(t_atm - t_pwv, 0.0), 3),
        "noise_gains_ms": round(1e3 * max(t_all - t_atm, 0.0), 3),
        "fields_total_ms": round(1e3 * t_all, 3),
    }
    # XLA-cost speed-of-light per stage (prefix deltas; see _executable_cost)
    if c_pwv and c_atm and c_all:
        stage_costs = {
            "screens_ar_pwv": (c_pwv, t_pwv),
            "bandpass_upsample": ({k: c_atm[k] - c_pwv[k] for k in c_atm}, t_atm - t_pwv),
            "noise_gains": ({k: c_all[k] - c_atm[k] for k in c_all}, t_all - t_atm),
        }
        out["stage_sol"] = {
            name: {k: v for k, v in (speed_of_light(c, t) or {}).items()
                   if k in ("xla_hbm_gb_per_tod", "sol_s_per_tod", "sol_frac", "bound_by")}
            # below ~100 us the marginal-time delta is timing noise
            for name, (c, t) in stage_costs.items() if t > 1e-4
        }
    return out


# v5e peak specs for the roofline context (public: 197 bf16 TFLOP/s,
# ~819 GB/s HBM per chip)
V5E_PEAK_BF16_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0


def roofline_estimate(program, per_tod_s: float) -> dict:
    """Order-of-magnitude utilization: the pipeline's minimum HBM
    traffic (each major (n_det, n_t) f32 stream read+written once) and
    its MXU work (binning one-hot contractions at the measured
    0.17 ns/sample; docs/tpu-design.md 'Binning roofline') against the
    chip peaks."""
    n_det, n_t = len(program.offsets), len(program.t_fine)
    n_samples = n_det * n_t
    n_coarse = len(program.t_coarse)
    # major f32 streams per realization: coarse pwv/loading (r+w), fine
    # atmosphere, noise (freq+time domains), total, binned read
    coarse_bytes = 4 * n_det * n_coarse * 4
    fine_bytes = 4 * n_det * n_t * 5
    traffic_gb = (coarse_bytes + fine_bytes) / 1e9
    hbm_frac = traffic_gb / max(per_tod_s, 1e-12) / V5E_HBM_GBPS
    binning_s = 0.17e-9 * n_samples  # MXU-bound measured cost
    return {
        "min_hbm_traffic_gb_per_tod": round(traffic_gb, 4),
        "hbm_roofline_frac": round(hbm_frac, 4),
        "binning_mxu_s_per_tod": round(binning_s, 6),
        "note": "lower bound on traffic; fusion removes intermediates, so >1 would mean the estimate undercounts",
    }


def bench_cpu_baseline(program, obs) -> float:
    """Single-threaded numpy implementation of the same synthesis, using
    the reference's algorithm structure (AR extrusion; scipy
    interpolation; cubic upsample). Setup (covariance factorization)
    excluded from timing, mirroring the device timing which excludes
    compilation."""
    import scipy as sp

    from maria_tpu.atmosphere.process import AutoregressiveProcess
    from maria_tpu.coords.transforms import offsets_to_phi_theta

    atm = obs.atmosphere
    rng = np.random.default_rng(0)

    # setup: AR processes matching each screen's grid (not timed)
    processes = []
    for screen in atm.screens:
        if getattr(screen, "band", "full") == "coarse":
            # the fine/coarse pair covers ONE physical layer; the
            # reference algorithm models each layer once
            continue
        # the footprint-sized grid the reference AR method needs (the
        # FFT-padded screen.nx/ny would overcharge the CPU baseline)
        nx = screen.nx_needed or screen.nx
        ny = screen.ny_needed or screen.ny
        cross = np.stack([screen.ty_min + screen.res * np.arange(ny), np.full(ny, screen.h)], axis=-1)
        extrusion = screen.tx_min + screen.res * np.arange(nx)
        proc = AutoregressiveProcess(cross_section=cross, extrusion=extrusion,
                                     callback_kwargs={"nu": 5 / 6, "r0": 1e3})
        proc.compute_covariance_matrices()
        processes.append((screen, proc))

    offsets = np.asarray(program.offsets, dtype=np.float64)
    bs_az = np.asarray(program.bs_az_coarse, dtype=np.float64)
    bs_el = np.asarray(program.bs_el_coarse, dtype=np.float64)
    t_c, t_f = program.t_coarse, program.t_fine

    start = time.perf_counter()

    pt = np.asarray(offsets_to_phi_theta(offsets[:, None, :], bs_az, bs_el))
    det_az, det_el = pt[..., 0], pt[..., 1]
    el_clip = np.clip(det_el, np.radians(5), np.pi / 2)
    cot = 1 / np.tan(el_clip)
    px, py = np.sin(det_az) * cot, np.cos(det_az) * cot

    pwv = np.full(det_az.shape, program.mean_pwv)

    def screen_contribution(item):
        screen, proc = item
        # the sequential AR loop (reference process.py:191-209)
        A = np.asarray(proc.A, dtype=np.float64)
        B = np.asarray(proc.B, dtype=np.float64)
        srng = np.random.default_rng(int(1e6 * screen.h))
        n_ext = proc.n_extrusion
        n_steps = 2 * n_ext
        BUF = srng.standard_normal((n_ext + n_steps, proc.n_cross_section))
        e_idx, c_idx = proc.extrusion_sample_index, proc.cross_section_sample_index
        for b in range(n_steps - 1, -1, -1):
            BUF[b] = A @ BUF[b + e_idx + 1, c_idx] + B @ srng.standard_normal(proc.n_live_edge)
        values = sp.ndimage.gaussian_filter(BUF[:n_ext], sigma=(1.0, 1.0))

        x = screen.h * px + screen.vx * t_c
        y = screen.h * py + screen.vy * t_c
        ca, sa = np.cos(screen.angle), np.sin(screen.angle)
        tx, ty = ca * x + sa * y, -sa * x + ca * y
        interp = sp.interpolate.RegularGridInterpolator(
            (proc.extrusion, proc.cross_section[:, 0]), values,
            method="linear", bounds_error=False, fill_value=0.0,
        )
        return screen.pwv_rms * interp(np.stack([tx, ty], axis=-1))

    # screens are independent: run them on a thread pool (BLAS/scipy
    # release the GIL), so the baseline is honestly multithreaded
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(len(processes) or 1, os.cpu_count())) as pool:
        for contribution in pool.map(screen_contribution, processes):
            pwv = pwv + contribution

    loading_c = np.zeros_like(pwv)
    for band in program.bands:
        interp = sp.interpolate.RegularGridInterpolator(
            (np.asarray(band.pwv_side), np.asarray(band.el_side)), np.asarray(band.power_table)
        )
        loading_c[band.det_index] = interp(
            np.stack([pwv[band.det_index], el_clip[band.det_index]], axis=-1)
        )

    loading = sp.interpolate.interp1d(
        t_c, loading_c, axis=-1, kind="cubic", bounds_error=False, fill_value="extrapolate"
    )(t_f)

    # noise (white + pink via FFT, reference noise/generation.py:11)
    n_det, n_t = loading.shape
    noise = np.sqrt(SAMPLE_RATE) * rng.standard_normal((n_det, n_t))
    f = np.fft.rfftfreq(n_t, d=1 / SAMPLE_RATE)
    for band in program.bands:
        with np.errstate(divide="ignore"):
            w = np.sqrt(2 * SAMPLE_RATE * np.where(f > 0, (band.knee / 2) / f, 0))
        pink = np.fft.irfft(w * np.fft.rfft(rng.standard_normal((len(band.det_index), n_t))), n=n_t)
        noise[band.det_index] = 1e12 * band.NEP * (noise[band.det_index] + pink)

    total = loading * np.exp(program.gain_error * rng.standard_normal(n_det))[:, None] + noise

    # map binning (reference BinMapper: sparse matvec == bincount)
    pix_ids, n_pix = _pixel_ids(program, obs)
    binned = np.bincount(pix_ids.ravel(), weights=total.ravel(), minlength=n_pix)
    assert binned.shape[0] == n_pix

    elapsed = time.perf_counter() - start
    return total.size / elapsed


def _headline_impl() -> dict:
    """MUSTANG-2 headline measurement: build + rate + utilization ONLY.

    The CPU baseline and the stage breakdown moved to their own legs so
    the scarce device budget goes to the two BASELINE.md configs first
    (round-3 lesson: the AtLAST leg starved behind the breakdown)."""
    _write_partial({"stage": "build-program"})
    _stamp("build MUSTANG-2 program")
    program, obs = build_program()
    _write_partial({"stage": "headline"})
    _stamp("headline: compile + time (single chained program)")
    tpu_rate, tpu_cost = bench_tpu(program, obs, return_cost=True)
    n_samples = len(program.offsets) * len(program.t_fine)
    sol = speed_of_light(tpu_cost, n_samples / tpu_rate)
    _write_partial({"tpu_rate": tpu_rate, "speed_of_light": sol, "stage": "headline-done"})
    _stamp(f"headline rate {tpu_rate:.3e} samples/s")
    return {"tpu_rate": tpu_rate, "speed_of_light": sol}


def headline():
    """The headline leg, run standalone in a FRESH process (see main).

    A fresh process gets its own relay session. Running this leg in the
    orchestrating parent wedges on this relay build: once any OTHER
    client session has existed (the backend probe subprocess), the
    parent's first device->host readback blocks forever (observed
    2026-08-20, faulthandler stack at jax array._value; H2D and compute
    still worked). Sequential fresh processes are the only layout the
    relay reliably serves."""
    _enable_compile_cache()
    print(json.dumps(_headline_impl()))


def config_b():
    """AtLAST-50k 3d benchmark, run standalone (see main: subprocess).

    The rate is streamed to the partial file the moment it is measured,
    so even a kill during the (cheap, but still device-touching)
    roofline accounting cannot lose the headline-priority number."""
    _enable_compile_cache()
    _write_partial({"stage": "atlast-build"})
    _stamp("build AtLAST-50k 3d program")
    program_b, obs_b = build_program(
        instrument="AtLAST-50k", site="ALMA", duration=60.0, radius=0.5, speed=0.25,
        atmosphere="3d",
    )
    _write_partial({"stage": "atlast-bench"})
    _stamp("AtLAST: compile + time")
    rate, cost = bench_tpu(program_b, obs_b, n_repeats=3, return_cost=True)
    _write_partial({"atlast_rate": rate, "stage": "atlast-roofline"})
    _stamp(f"AtLAST rate {rate:.3e} samples/s")
    n_samples = len(program_b.offsets) * len(program_b.t_fine)
    atlast_roofline = roofline_estimate(program_b, n_samples / rate)
    sol = speed_of_light(cost, n_samples / rate)
    if sol:
        atlast_roofline.update(sol)
    _write_partial({"atlast_roofline": atlast_roofline, "stage": "atlast-stages"})
    print(json.dumps({
        "atlast_rate": round(rate, 1),
        # lower-bound traffic model + the executable's own XLA cost model
        "atlast_roofline": atlast_roofline,
    }))
    # per-stage breakdown WITH per-stage speed-of-light at the scale
    # where stages are measurable (AtLAST stages run 5-20 ms/TOD; the
    # MUSTANG-2 stages are < 100 us and fall under bench_stages' timing
    # noise floor, which left BENCH_r04's stage_sol empty — VERDICT r4
    # item 6). 3 more compiles; budget-guarded so the headline-priority
    # numbers above can never starve behind it.
    if _remaining() > 240:
        stages = bench_stages(program_b, n_repeats=2)
        stages["binning_ms"] = round(
            max(1e3 * (n_samples / rate - stages["fields_total_ms"] / 1e3), 0.0), 3)
        _write_partial({"atlast_stage_breakdown": stages, "stage": "atlast-done"})
        print(json.dumps({"atlast_stage_breakdown": stages}))
    else:
        _stamp(f"skipping AtLAST stage breakdown (remaining {_remaining():.0f}s)")


def streamed_leg():
    """Streamed AtLAST-50k x 600 s — the scene whose BATCH program
    cannot fit HBM (~20 GB of fine-rate temporaries). Measures the
    production StreamingExecutor warm rate with the round-5 HBM-resident
    per-block run plans (VERDICT r4 item 2: the arbitrarily-long claim
    is only as good as its fast path)."""
    _enable_compile_cache()
    import jax

    _write_partial({"stage": "streamed-build"})
    _stamp("build AtLAST-50k x 600 s streamed scene")
    program, obs = build_program(
        instrument="AtLAST-50k", site="ALMA", duration=600.0, radius=0.5, speed=0.25,
        atmosphere="3d",
    )
    from maria_tpu.ops.streaming_exec import StreamingExecutor

    ex = StreamingExecutor(program, obs, block_tc=128)
    _write_partial({"stage": "streamed-warm"})
    key = jax.random.key(0)
    r = ex.run(key, group_size=8)  # compile + warm (resident plans build here)
    _stamp("streamed: compiled + warm")
    times = []
    for _ in range(2):
        t0l = time.perf_counter()
        r = ex.run(key, group_size=8)
        times.append(time.perf_counter() - t0l)
    rate = r.n_samples / min(times)
    resident = ex._resident is not None
    _write_partial({
        "streamed_rate": round(rate, 1), "streamed_resident_plans": resident,
        "stage": "streamed-done",
    })
    _stamp(f"streamed rate {rate:.3e} samples/s (resident={resident})")
    print(json.dumps({
        "streamed_rate": round(rate, 1), "streamed_resident_plans": resident,
    }))


def cpu_baseline_leg(n_repeats: int = 3):
    """CPU-baseline leg: never touches the relay (forced CPU platform),
    so it can run even when the device budget is exhausted. Median of
    `n_repeats` to damp this box's 2.4x load-dependent swing; the range
    rides in the JSON so the multiplier's error bar is explicit."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    _enable_compile_cache()
    _write_partial({"stage": "cpu-baseline-build"})
    program, obs = build_program()
    rates = []
    for _ in range(n_repeats):
        rates.append(bench_cpu_baseline(program, obs))
        _write_partial({"cpu_rate": float(np.median(rates)),
                        "cpu_rate_range": [round(min(rates), 1), round(max(rates), 1)],
                        "stage": "cpu-baseline"})
    _stamp(f"cpu baseline {np.median(rates):.3e} samples/s (range {min(rates):.2e}-{max(rates):.2e})")
    print(json.dumps({"cpu_rate": float(np.median(rates)),
                      "cpu_rate_range": [round(min(rates), 1), round(max(rates), 1)]}))


def stages_leg():
    """Per-stage breakdown + traffic roofline for the MUSTANG-2 program
    (6 more compiled programs — the cheapest leg, so it runs last)."""
    _enable_compile_cache()
    _write_partial({"stage": "stages-build"})
    program, obs = build_program()
    _write_partial({"stage": "stages-bench"})
    _stamp("stage breakdown (6 chained programs)")
    stages = bench_stages(program)
    roofline = roofline_estimate(program, stages["fields_total_ms"] / 1e3)
    tpu_rate = float(os.environ.get("BENCH_TPU_RATE", "0") or 0)
    if tpu_rate > 0:
        n_samples = len(program.offsets) * len(program.t_fine)
        stages["binning_ms"] = round(
            max(1e3 * (n_samples / tpu_rate - stages["fields_total_ms"] / 1e3), 0.0), 3)
    _write_partial({"stage_breakdown": stages, "roofline": roofline, "stage": "stages-done"})
    print(json.dumps({"stage_breakdown": stages, "roofline": roofline}))


def _run_leg(flag: str, budget: float, env_extra: dict = None, tpu: bool = True) -> dict:
    """Run one bench leg in a fresh subprocess (relay discipline: each
    device-touching client gets its own process and a ~10 s grace after
    exit before the next client connects). Returns the union of the
    leg's stdout JSON lines and its streamed partial file, so results
    survive a timeout kill mid-leg."""
    import subprocess
    import tempfile

    global _ACTIVE_CHILD
    pfile = os.path.join(
        tempfile.gettempdir(), f"bench_partial_{os.getpid()}_{flag.strip('-')}.jsonl")
    try:
        os.unlink(pfile)
    except OSError:
        pass
    env = dict(os.environ, BENCH_PARTIAL_FILE=pfile,
               BENCH_DEADLINE_S=str(max(90.0, budget - 15)))
    if env_extra:
        env.update(env_extra)
    out: dict = {}
    _stamp(f"{flag} leg subprocess, budget {budget:.0f}s")
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), flag],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)), env=env,
    )
    if tpu:
        _ACTIVE_CHILD = proc
    try:
        stdout, stderr = proc.communicate(timeout=budget)
        sys.stderr.write((stderr or "")[-6000:])
        for line in (stdout or "").splitlines():
            if line.startswith("{"):
                try:
                    out.update(json.loads(line))
                except json.JSONDecodeError:
                    continue
    except subprocess.TimeoutExpired:
        _stamp(f"{flag} leg hit its budget ({budget:.0f}s); killed")
        proc.kill()
        try:
            _, stderr = proc.communicate(timeout=15)
            sys.stderr.write((stderr or "")[-4000:])
        except Exception:  # noqa: BLE001 — partial file still has the milestones
            pass
    finally:
        if tpu:
            _ACTIVE_CHILD = None
            # relay grace: a new client stream opened immediately after
            # another client disconnects (or is killed mid-compile)
            # wedges — let the old stream finish closing
            time.sleep(10)
    merged = _read_partial(pfile)
    merged.update(out)
    return merged


# CPU-only child env: the axon sitecustomize forces the TPU platform
# whenever PALLAS_AXON_POOL_IPS is non-empty, so clear it — these legs
# must never open a relay session
_CPU_ENV = {"PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"}


def main():
    _enable_compile_cache()
    _start_watchdog()
    platform_name = _acquire_backend()
    fallback = platform_name == "cpu-fallback"
    _PARTIAL.update(platform=platform_name, stage="headline")

    head: dict = {}
    if fallback:
        # no relay: the in-process CPU path cannot wedge
        _stamp("CPU fallback: headline leg in-process")
        head = _headline_impl()
    else:
        budget = min(_remaining() - 480, 520)
        # ONE attempt here: when the compile server is in its
        # pathological state (>520 s for a program that compiles in
        # ~45 s warm — observed repeatedly 2026-08-20/21 night), an
        # immediate second attempt just burns the budget the
        # end-of-run retry needs; the killed attempt's compile seeds
        # the server cache, which is what makes the LAST retry land
        if budget >= 180:
            head = _run_leg("--headline", budget)
            if not head.get("tpu_rate"):
                _stamp("headline leg produced no rate (retry runs last)")
        else:
            _stamp(f"headline attempt skipped (budget {budget:.0f}s)")
    tpu_rate = head.get("tpu_rate")
    # a failed headline (cold/degraded compile server: both attempts of
    # 2026-08-20 evening overran 520 s on a program that compiles in
    # ~1 min warm) no longer aborts the run — every other leg still
    # measures, and the headline retries LAST with whatever budget
    # remains (the killed attempts' compiles may be server-cached)
    _PARTIAL.update(tpu_rate=tpu_rate, speed_of_light=head.get("speed_of_light"),
                    stage="config-b")

    # DEGRADED-SERVER path: with no headline rate, the multi-program
    # TPU legs (config-b's cold build alone measured 677 s) would only
    # starve the one number that can still land — the headline retry on
    # the cache its killed attempt just seeded. Run the CPU baseline
    # (no relay) and throw the whole remaining budget at the retry;
    # anything left after that flows into the normal sequence below.
    cb: dict = {}
    if not tpu_rate and not fallback and _remaining() > 150:
        cb = _run_leg("--cpu-baseline", budget=max(min(_remaining() - 400, 240), 60),
                      env_extra=_CPU_ENV, tpu=False)
        _PARTIAL.update(cpu_rate=cb.get("cpu_rate"))
        head = _run_leg("--headline", max(min(_remaining() - 60, 600), 120))
        tpu_rate = head.get("tpu_rate")
        _PARTIAL.update(tpu_rate=tpu_rate, speed_of_light=head.get("speed_of_light"))

    # config (b) runs IMMEDIATELY after the headline (round-3 lesson:
    # it starved behind the CPU baseline + stage breakdown and the
    # driver artifact recorded null — VERDICT r3 item 1)
    b: dict = {}
    budget = min(_remaining() - 120, 780)
    if fallback:
        _stamp("skipping AtLAST config (no TPU; 50k-det x 3d is infeasible on 1 CPU core)")
    elif budget > 240:
        b = _run_leg("--config-b", budget)
    else:
        _stamp(f"skipping AtLAST config (budget {budget:.0f}s)")
    atlast_rate = b.get("atlast_rate")
    _PARTIAL.update(atlast_rate=atlast_rate, atlast_roofline=b.get("atlast_roofline"),
                    stage="streamed")

    # streamed AtLAST x 600 s (batch cannot fit HBM): VERDICT r4 item 2.
    # A cold remote-compile server measured 1205 s for this leg's ~6
    # programs (warm: minutes); the standalone validation number
    # (1.09e9 samples/s, resident plans) is recorded in BASELINE.md in
    # case the budget kills it here.
    sl: dict = {}
    budget = min(_remaining() - 240, 1000)
    if fallback:
        _stamp("skipping streamed leg (no TPU)")
    elif budget > 300:
        sl = _run_leg("--streamed", budget)
    else:
        _stamp(f"skipping streamed leg (budget {budget:.0f}s)")
    _PARTIAL.update(streamed_rate=sl.get("streamed_rate"), stage="cpu-baseline")

    # CPU baseline: forced-CPU subprocess, cannot wedge the relay
    # (skipped when the degraded-server path above already measured it)
    if fallback:
        cb = {"cpu_rate": bench_cpu_baseline(*build_program())}
    elif not cb.get("cpu_rate"):
        cb = _run_leg("--cpu-baseline", budget=max(min(_remaining() - 60, 240), 60),
                      env_extra=_CPU_ENV, tpu=False)
    cpu_rate = cb.get("cpu_rate")
    _PARTIAL.update(cpu_rate=cpu_rate, stage="stages")

    st: dict = {}
    budget = min(_remaining() - 75, 420)
    if not fallback and budget > 150:
        st = _run_leg("--stages", budget,
                      env_extra={"BENCH_TPU_RATE": str(tpu_rate or 0)})
    else:
        _stamp(f"skipping stage breakdown (budget {budget:.0f}s)")
    _PARTIAL.update(stage_breakdown=st.get("stage_breakdown"), stage="assemble")

    # last-chance headline retry. The 420 s floor can push past the
    # soft deadline — that is safe by construction: the watchdog has
    # already printed the partial-result JSON at the deadline, so a
    # later, better final line only improves what the driver reads
    # (and an external kill still leaves the watchdog line as output).
    # Observed 2026-08-21: killed attempts do NOT reliably seed the
    # compile-server cache — only an UNINTERRUPTED attempt long enough
    # for the compile lands in the degraded state.
    if not tpu_rate and not fallback:
        _PARTIAL["grace"] = True  # hold the watchdog's hard exit
        head = _run_leg("--headline", max(_remaining() - 45, 420))
        _PARTIAL["grace"] = False
        tpu_rate = head.get("tpu_rate")
        _PARTIAL.update(tpu_rate=tpu_rate, speed_of_light=head.get("speed_of_light"))

    result = {
        "metric": "TOD samples/sec (MUSTANG-2 daisy, 2d atmosphere + noise + map binning, end-to-end on device)",
        "value": round(tpu_rate, 1) if tpu_rate else 0.0,
        "unit": "samples/s",
        "vs_baseline": round(tpu_rate / cpu_rate, 2) if (tpu_rate and cpu_rate) else None,
        "baseline_samples_per_s": round(cpu_rate, 1) if cpu_rate else None,
        "baseline_range_samples_per_s": cb.get("cpu_rate_range"),
        "baseline_threads": os.cpu_count(),
        "platform": platform_name,
        "atlast_50k_samples_per_s": round(atlast_rate, 1) if atlast_rate else None,
        "atlast_roofline": b.get("atlast_roofline"),
        # streamed AtLAST-50k x 600 s (batch cannot fit HBM); resident
        # per-block run plans (ops/streaming_exec.py round 5)
        "atlast_streamed_600s_samples_per_s": sl.get("streamed_rate"),
        "atlast_streamed_resident_plans": sl.get("streamed_resident_plans"),
        # per-stage ms AND per-stage XLA speed-of-light (stage_sol) at
        # AtLAST scale, where stage times are far above the noise floor
        "atlast_stage_breakdown": b.get("atlast_stage_breakdown"),
        "stage_breakdown": st.get("stage_breakdown"),
        "roofline": st.get("roofline"),
        # utilization vs the executable's own post-fusion XLA cost model
        # (full pipeline incl. binning; lower bound, see speed_of_light)
        "speed_of_light": head.get("speed_of_light"),
    }
    if fallback:
        result["error"] = "tpu-backend-unavailable"
        result["note"] = "TPU relay never answered; value measured on the CPU fallback platform"
    elif not tpu_rate:
        result["error"] = "headline-leg-failed"
        result["note"] = (
            "the headline subprocess produced no result within its budget on any "
            "attempt (degraded/cold remote compile server or wedged relay); the "
            "other legs' numbers above are real measurements from this run"
        )
    with _PRINT_LOCK:
        _PARTIAL["done"] = True
        print(json.dumps(result))


if __name__ == "__main__":
    if "--config-b" in sys.argv:
        config_b()
    elif "--headline" in sys.argv:
        headline()
    elif "--streamed" in sys.argv:
        streamed_leg()
    elif "--cpu-baseline" in sys.argv:
        cpu_baseline_leg()
    elif "--stages" in sys.argv:
        stages_leg()
    else:
        try:
            main()
        except Exception as e:  # noqa: BLE001 — the driver must always get one JSON line
            import traceback

            traceback.print_exc(file=sys.stderr)
            print(json.dumps({
                "metric": "TOD samples/sec (MUSTANG-2 daisy, 2d atmosphere + noise + map binning, end-to-end on device)",
                "value": None,
                "unit": "samples/s",
                "vs_baseline": None,
                "error": f"{type(e).__name__}: {e}"[:400],
            }))
            sys.exit(0)
