"""Microbench the STREAMED in-scan binning variants in isolation on
AtLAST-shaped synthetic data: per-sample blocked (blocked_local_ids +
bin_blocked) vs run-compressed (bin_runs_traced), with XProf top-op
attribution for the runs variant. One streaming block per measurement
(ids synthesized on device from a daisy-like track — realistic run
lengths), k-chained to amortize the relay RTT.

Usage (SOLO): timeout 1700 python tools/probe_stream_binning.py
"""

from __future__ import annotations

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    import bench

    bench._enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from maria_tpu.ops.binning import bin_blocked, blocked_local_ids, BlockedBinPlan, _hilbert_order
    from maria_tpu.ops.binning_runs import bin_runs_traced

    t0 = time.time()

    def stamp(msg):
        print(f"[probe +{time.time()-t0:.0f}s] {msg}", file=sys.stderr, flush=True)

    # AtLAST-50k streamed-block shapes (block_tc 128 x r 10 = 1280)
    n_det, B = 50004, 1280
    n_y = n_x = 128
    det_block, chunk, seg = 1024, 64, 64
    n_blocks = -(-n_det // det_block)
    n_chunks = B // chunk
    r_max = 32
    wy = wx = 88

    rng = np.random.default_rng(0)
    # daisy-like boresight track + per-detector offsets; speed tuned to
    # the REAL AtLAST bench rate (~0.27 pixel changes/sample, <=35 runs
    # per 128-chunk — BASELINE.md round-3 measurement)
    tt = np.arange(B) / 50.0
    bx = 40 * np.sin(2 * np.pi * 0.05 * tt) * np.sin(2 * np.pi * 0.011 * tt) + 64
    by = 40 * np.cos(2 * np.pi * 0.05 * tt) * np.sin(2 * np.pi * 0.011 * tt) + 64
    od = rng.uniform(-24, 24, (n_det, 2))
    iy_np = np.clip(np.round(by[None] + od[:, :1]), 0, n_y - 1).astype(np.int32)
    ix_np = np.clip(np.round(bx[None] + od[:, 1:]), 0, n_x - 1).astype(np.int32)
    order = _hilbert_order(iy_np.mean(1).astype(np.int64), ix_np.mean(1).astype(np.int64))
    pad_d = n_blocks * det_block - n_det
    order_p = np.concatenate([order, np.full(pad_d, order[-1], dtype=order.dtype)])
    # measured run stats for context
    p = (iy_np * n_x + ix_np).reshape(n_det, -1, seg)
    runs = 1 + (p[..., 1:] != p[..., :-1]).sum(-1)
    stamp(f"synthetic ids: max runs/seg {runs.max()}, mean {runs.mean():.1f}")

    tod = jnp.asarray(rng.standard_normal((n_det, B)).astype(np.float32) + 50.0)
    iy = jnp.asarray(iy_np)
    ix = jnp.asarray(ix_np)
    order_dev = jnp.asarray(order_p.astype(np.int32))
    statics = dict(n_det=n_det, det_block=det_block, n_blocks=n_blocks,
                   n_chunks=n_chunks, chunk=chunk, seg=seg, r_max=r_max,
                   wy=wy, wx=wx, n_y=n_y, n_x=n_x)
    bp = BlockedBinPlan(
        n_y=n_y, n_x=n_x, wy=wy, wx=wx, chunk=chunk, n_chunks=n_chunks,
        det_block=det_block, n_blocks=n_blocks, n_t=B,
        order=order_p.astype(np.int32), ly=None, lx=None, origins=None,
    )

    k_chain = 8

    def make_runs_fn(**over):
        st = dict(statics, **over)

        @jax.jit
        def runs_fn(tod, iy, ix, order_dev):
            def body(c, i):
                s, w, lost = bin_runs_traced(tod + i, iy, ix, order_dev, **st)
                return c + s.max() + w.max() + lost, ()
            out, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(k_chain, dtype=jnp.float32))
            return out
        return runs_fn

    runs_fn = make_runs_fn()

    def make_blocked_fn(precision=None):
        @jax.jit
        def blocked_fn(tod, iy, ix, order_dev):
            def body(c, i):
                ly, lx, origins, lost = blocked_local_ids(
                    iy, ix, order_dev, n_det, det_block, n_blocks, n_chunks, chunk,
                    wy, wx, n_y, n_x)
                data2 = jnp.stack([tod + i, jnp.ones_like(tod)])
                maps = bin_blocked(data2, bp, ly=ly.astype(jnp.int8), lx=lx.astype(jnp.int8),
                                   origins=origins, order=order_dev, precision=precision)
                return c + maps.max() + lost.sum(), ()
            out, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(k_chain, dtype=jnp.float32))
            return out
        return blocked_fn

    blocked_fn = make_blocked_fn()

    def timeit(f, name):
        c = f.lower(tod, iy, ix, order_dev).compile()
        float(np.asarray(c(tod, iy, ix, order_dev)))
        rtt = bench.measure_dispatch_rtt()
        times = []
        for _ in range(3):
            s = time.perf_counter()
            float(np.asarray(c(tod, iy, ix, order_dev)))
            times.append(time.perf_counter() - s)
        per = (min(times) - rtt) / k_chain
        stamp(f"{name}: {per*1e3:.2f} ms/block ({per*47*1e3:.0f} ms per 600 s obs)")
        return c

    c_runs = timeit(runs_fn, "runs seg=64 R=32")
    timeit(blocked_fn, "blocked")
    # seg sweep: extraction cost scales with samples x R; R shrinks with
    # seg while the MXU row count S x R stays ~flat (boundary splits)
    p32 = (iy_np * n_x + ix_np).reshape(n_det, -1, 32)
    r32 = int(np.ceil(1.25 * (1 + (p32[..., 1:] != p32[..., :-1]).sum(-1)).max()) + 2)
    r32 = -(-r32 // 8) * 8
    p16 = (iy_np * n_x + ix_np).reshape(n_det, -1, 16)
    r16 = int(np.ceil(1.25 * (1 + (p16[..., 1:] != p16[..., :-1]).sum(-1)).max()) + 2)
    r16 = -(-r16 // 8) * 8
    stamp(f"seg sweep r_max: seg32 -> {r32}, seg16 -> {r16}")
    timeit(make_runs_fn(seg=32, r_max=r32), f"runs seg=32 R={r32}")
    # one-pass precision modes for the per-sample path: the in-scan call
    # inherited bin_blocked's default HIGH (3 bf16 passes, f32 hats)
    timeit(make_blocked_fn("hilo"), "blocked hilo (2-pass bf16)")
    timeit(make_blocked_fn("shifted"), "blocked shifted (1-pass bf16)")

    # pre-permuted detectors (batch data_in_plan_order equivalent): ids
    # and data arrive already in plan order -> identity order, no gathers
    ident = jnp.asarray(np.concatenate([
        np.arange(n_det, dtype=np.int32),
        np.full(pad_d, n_det - 1, dtype=np.int32)]))
    tod_p = jnp.asarray(np.asarray(tod)[order])
    iy_p = jnp.asarray(iy_np[order])
    ix_p = jnp.asarray(ix_np[order])

    def timeit_p(f, name):
        c = f.lower(tod_p, iy_p, ix_p, ident).compile()
        float(np.asarray(c(tod_p, iy_p, ix_p, ident)))
        rtt = bench.measure_dispatch_rtt()
        times = []
        for _ in range(3):
            s = time.perf_counter()
            float(np.asarray(c(tod_p, iy_p, ix_p, ident)))
            times.append(time.perf_counter() - s)
        per = (min(times) - rtt) / k_chain
        stamp(f"{name}: {per*1e3:.2f} ms/block ({per*47*1e3:.0f} ms per 600 s obs)")

    timeit_p(make_blocked_fn("shifted"), "blocked shifted PRE-PERMUTED")
    timeit_p(make_runs_fn(), "runs seg=64 PRE-PERMUTED")

    from trace_sampler import summarize_trace

    with jax.profiler.trace("/tmp/trace_stream_runs"):
        float(np.asarray(c_runs(tod, iy, ix, order_dev)))
    summarize_trace("/tmp/trace_stream_runs", top=18)

    c_blocked = blocked_fn.lower(tod, iy, ix, order_dev).compile()
    float(np.asarray(c_blocked(tod, iy, ix, order_dev)))
    with jax.profiler.trace("/tmp/trace_stream_blocked"):
        float(np.asarray(c_blocked(tod, iy, ix, order_dev)))
    print("\n##### BLOCKED PATH #####")
    summarize_trace("/tmp/trace_stream_blocked", top=18)

    # reference point: the BATCH runchunk binning (static precomputed
    # plan) on this very block — the cost a setup-precomputed streamed
    # plan would pay at runtime (plus H2D of the plan arrays)
    from maria_tpu.ops.binning_runs import bin_runchunk, make_runchunk_bin_plan_on_device

    rplan = make_runchunk_bin_plan_on_device(
        iy, ix, n_y, n_x, chunk=chunk, det_block=det_block, seg=seg, order=order)
    if rplan is None:
        stamp("runchunk plan: None (windows/runs unqualified)")
        return
    stamp(f"runchunk plan: chunk {rplan.chunk} seg {rplan.seg} r_max {rplan.r_max} "
          f"window {rplan.wy}x{rplan.wx} plan bytes "
          f"{rplan.e_idx.size * 3 / 1e6:.0f} MB")
    plan_args = rplan.device_args()
    tod_p2 = jnp.asarray(np.asarray(tod)[order])

    def make_batch_fn(precision):
        @jax.jit
        def batch_fn(tod, e, rly, rlx, origins2, order2, wcnt):
            def body(c, i):
                m = bin_runchunk(
                    jnp.stack([tod + i, jnp.ones_like(tod)]), rplan, e_idx=e,
                    run_ly=rly, run_lx=rlx, origins=origins2, order=order2,
                    wcnt=wcnt, data_in_plan_order=True, precision=precision)
                return c + m.max(), ()
            out, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(k_chain, dtype=jnp.float32))
            return out
        return batch_fn

    for prec in ("shifted", "hilo"):
        f = make_batch_fn(prec)
        c = f.lower(tod_p2, *plan_args).compile()
        float(np.asarray(c(tod_p2, *plan_args)))
        rtt = bench.measure_dispatch_rtt()
        times = []
        for _ in range(3):
            s = time.perf_counter()
            float(np.asarray(c(tod_p2, *plan_args)))
            times.append(time.perf_counter() - s)
        per = (min(times) - rtt) / k_chain
        stamp(f"batch runchunk {prec}: {per*1e3:.2f} ms/block "
              f"({per*47*1e3:.0f} ms per 600 s obs)")


if __name__ == "__main__":
    main()
