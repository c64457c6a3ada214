"""Probe: where does the ML mapper CG step spend its time, and does the
run-compressed P^T actually beat the blocked P^T in the CG's exact
context (MUSTANG-2 60 s daisy onto the 512x512 big_cluster map)?

Times, on the default device:
  - P^T via bin_runchunk(hilo) with the mapper's auto plan
  - P^T via bin_blocked with the blocked plan
  - P (gather) and the FFT noise weighting, for context
Prints plan geometries. Not part of the test suite — a measurement tool.
"""

from __future__ import annotations

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import hashlib
import platform

try:
    with open("/proc/cpuinfo") as _f:
        _cpu = next((line for line in _f if line.startswith("flags")), "")
except OSError:
    _cpu = platform.processor()
_tag = hashlib.md5((platform.machine() + _cpu).encode()).hexdigest()[:8]
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", f"/tmp/jax-comp-cache-{_tag}")


def bench(f, *args, n=50):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return 1e3 * (time.time() - t0) / n


if __name__ == "__main__":
    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    import jax.numpy as jnp
    import numpy as np

    import maria_tpu
    from maria_tpu.mappers import MaximumLikelihoodMapper
    from maria_tpu.plan import Planner

    input_map = maria_tpu.map.get("big_cluster", center=(150.0, 10.0))
    plans = Planner(target=(150.0, 10.0), site="GBT").generate_plans(
        start_time=1.75e9, horizon_days=2, total_duration=60, chunk_duration=60,
        scan_pattern="daisy", scan_options={"radius": 0.083, "speed": 0.017}, sample_rate=50,
    )
    sim = maria_tpu.Simulation(
        instrument="MUSTANG-2", plans=plans[0], site="GBT",
        atmosphere="2d", noise=True, map=input_map, seed=2,
    )
    tod = sim.run()[0]

    mapper = MaximumLikelihoodMapper(
        [tod], center=(150.0, 10.0), width=np.degrees(input_map.width),
        resolution=np.degrees(input_map.resolution),
        frame="ra/dec", units="K_RJ", n_epochs=1, n_cg_iters=10,
    )
    block = mapper.blocks[0]
    rp = block.get("rmeta")
    if rp is not None:
        print(f"run plan: chunk={rp.chunk} seg={rp.seg} R={rp.r_max} "
              f"w=({rp.wy},{rp.wx}) nb={rp.n_blocks} db={rp.det_block} nc={rp.n_chunks}")
    else:
        print("run plan: None")

    from maria_tpu.ops.binning import make_blocked_bin_plan_on_device

    within = block["pix"] % mapper.n_pix1
    ovf = within == mapper.n_pix
    iy = jnp.where(ovf, -1, within // mapper.n_x)
    ix = jnp.where(ovf, -1, within % mapper.n_x)
    bp = make_blocked_bin_plan_on_device(iy, ix, mapper.n_y, mapper.n_x)
    print(f"blocked plan: chunk={bp.chunk} w=({bp.wy},{bp.wx}) nb={bp.n_blocks} "
          f"db={bp.det_block} nc={bp.n_chunks}")

    v = jnp.asarray(np.random.default_rng(0).normal(size=block["data"].shape), jnp.float32)

    blk_run = dict(block)
    blk_blk = dict(block)
    blk_blk.pop("rmeta", None)
    blk_blk["bmeta"] = bp
    blk_blk["bly"], blk_blk["blx"] = bp.ly, bp.lx
    blk_blk["borig"] = jnp.asarray(bp.origins)
    blk_blk["border"] = jnp.asarray(bp.order)

    f_run = jax.jit(lambda v: mapper._project_T_mxu(v, blk_run))
    f_blk = jax.jit(lambda v: mapper._project_T_mxu(v, blk_blk))
    a, b = f_run(v), f_blk(v)
    err = float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-30))
    print(f"P^T run vs blocked rel err: {err:.2e}")
    print(f"P^T runchunk(hilo): {bench(f_run, v):.3f} ms")
    print(f"P^T blocked:        {bench(f_blk, v):.3f} ms")

    f_p = jax.jit(lambda m: mapper._project(m, block))
    m0 = jnp.asarray(np.random.default_rng(1).normal(size=mapper.n_s * mapper.n_cpix), jnp.float32)
    print(f"P (gather):         {bench(f_p, m0):.3f} ms")

    # FFT noise weighting, as applied per CG step
    if hasattr(mapper, "_apply_Ninv"):
        f_n = jax.jit(lambda v: mapper._apply_Ninv(v, 0))
        try:
            print(f"N^-1 (FFT):         {bench(f_n, v):.3f} ms")
        except Exception as e:  # signature drift — context only
            print(f"N^-1 probe skipped: {e}")
