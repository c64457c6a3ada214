"""The fully fused device program: atmosphere + cmb + map + noise in ONE
jit call (reference runs these as separate per-stage numpy passes,
maria/sim/simulation.py:213-247)."""

import jax
import numpy as np
import pytest

import maria_tpu
from maria_tpu.ops.program import build_tod_program
from maria_tpu.plan import Planner


@pytest.fixture(scope="module")
def full_scene():
    input_map = maria_tpu.map.get("big_cluster", center=(150.0, 10.0))
    plan = Planner(target=(150.0, 10.0), site="GBT").generate_plans(
        start_time=1.75e9, horizon_days=2, total_duration=20, chunk_duration=20,
        scan_pattern="daisy", scan_options={"radius": 0.083, "speed": 0.017}, sample_rate=20,
    )[0]
    sim = maria_tpu.Simulation(
        instrument="MUSTANG-2", plans=plan, site="GBT",
        atmosphere="2d", cmb="generate", cmb_kwargs={"nside": 64},
        map=input_map, noise=True, seed=4,
    )
    return sim


def test_all_fields_from_one_program(full_scene):
    sim = full_scene
    obs = sim.obs_list[0]
    tod = sim.run()[0]
    # every field came out of the fused program (none recomputed by mixins)
    assert sorted(obs.loading) == ["atmosphere", "cmb", "map", "noise"]
    for name in obs.loading:
        v = np.asarray(obs.loading[name])
        assert np.isfinite(v).all(), name
        assert v.std() > 0, name
    assert np.isfinite(np.asarray(tod.signal)).all()


def test_fused_cmb_and_map_match_mixins(full_scene):
    """The in-program cmb/map stages must agree with the mixin physics
    (same pwv realization) to the coarse-factor-upsampling tolerance."""
    sim = full_scene
    obs = sim.obs_list[0]
    program = build_tod_program(
        obs, with_noise=False, noise_kwargs={},
        cmb=sim.cmb, input_map=sim.map, map_kwargs=sim.map_kwargs,
    )
    key = jax.random.key(123)
    fields, pwv_fine = jax.jit(program.fields_fn())(key, *program.example_args(key)[1:])
    obs.zenith_scaled_pwv = pwv_fine

    cmb_mixin = np.asarray(sim._compute_cmb_loading(obs))
    cmb_fused = np.asarray(fields["cmb"])
    diff = cmb_fused - cmb_mixin
    # RMS agreement to 5% of the anisotropy scale; the residual is the
    # el-upsampling of the calibration factors (the sky term is exact)
    assert diff.std() < 0.05 * cmb_mixin.std()
    assert np.abs(diff).max() < 0.5 * cmb_mixin.std()

    loading_backup = dict(obs.loading)
    sim._sample_maps(obs)
    map_mixin = np.asarray(obs.loading["map"])
    obs.loading = loading_backup
    map_fused = np.asarray(fields["map"])
    assert np.abs(map_fused - map_mixin).max() < 0.05 * map_mixin.std()


@pytest.mark.slow
def test_noise_sees_cmb_and_map_loading():
    """NEP_per_loading inside the program must include the cmb/map
    fields (reference sim/noise.py:33 sums all loadings). The physics
    wiring doesn't need the full MUSTANG-2 scene — a tiny instrument
    halves the two jit compiles this test pays."""
    from maria_tpu.map import ProjectionMap

    rng = np.random.default_rng(0)
    input_map = ProjectionMap(
        data=1e-3 * rng.standard_normal((1, 1, 1, 64, 64)).astype(np.float32),
        center=(150.0, 50.0), width=2.0, frame="az/el", nu=[150e9],
        units="K_RJ", degrees=True,
    )
    plan = maria_tpu.get_plan(
        "five_second_stare", start_time=1.75e9, sample_rate=10,
        scan_center=(150.0, 50.0), frame="az/el",
    )
    sim = maria_tpu.Simulation(
        instrument="test/1deg", plans=plan, site="GBT",
        atmosphere="2d", cmb="generate", cmb_kwargs={"nside": 32},
        map=input_map, noise=True, seed=4,
    )
    obs = sim.obs_list[0]
    program = build_tod_program(
        obs, with_noise=True, noise_kwargs=sim.noise_kwargs,
        cmb=sim.cmb, input_map=sim.map, map_kwargs=sim.map_kwargs,
    )
    for b in program.bands:
        b.NEP_per_loading = 0.0
    key = jax.random.key(5)
    args = program.example_args(key)[1:]
    base = np.asarray(jax.jit(program.fields_fn())(key, *args)[0]["noise"])
    for b in program.bands:
        b.NEP_per_loading = 10.0
    loaded = np.asarray(jax.jit(program.fields_fn())(key, *args)[0]["noise"])
    assert loaded.std() > 2 * base.std()


@pytest.mark.slow
def test_unfused_mixin_path(full_scene):
    """Simulation(fused=False) runs the per-stage mixin path; its fields
    must statistically match the fused program's."""
    import maria_tpu
    from maria_tpu.plan import Planner

    input_map = maria_tpu.map.get("big_cluster", center=(150.0, 10.0))
    plan = Planner(target=(150.0, 10.0), site="GBT").generate_plans(
        start_time=1.75e9, horizon_days=2, total_duration=20, chunk_duration=20,
        scan_pattern="daisy", scan_options={"radius": 0.083, "speed": 0.017}, sample_rate=20,
    )[0]
    sim = maria_tpu.Simulation(
        instrument="MUSTANG-2", plans=plan, site="GBT",
        atmosphere="2d", cmb="generate", cmb_kwargs={"nside": 64},
        map=input_map, noise=True, seed=4, fused=False,
    )
    obs = sim.obs_list[0]
    tod = sim.run()[0]
    assert sorted(obs.loading) == ["atmosphere", "cmb", "map", "noise"]
    assert np.isfinite(np.asarray(tod.signal)).all()

    fused_obs = full_scene.obs_list[0]
    if not fused_obs.loading:  # independent of sibling-test ordering
        full_scene.run()
    for name in ("atmosphere", "cmb", "map"):
        a = np.asarray(obs.loading[name])
        b = np.asarray(fused_obs.loading[name])
        assert 0.5 < (a.std() + 1e-30) / (b.std() + 1e-30) < 2.0, name


def test_program_hlo_carries_no_large_constants():
    """The remote-compile trap guard: spectral tables, noise bases, and
    detector-index arrays must ride as jit arguments / static slices,
    never as embedded HLO constants (at AtLAST scale those reached
    ~8.5 MB and multi-minute remote compiles)."""
    import re

    import jax

    import maria_tpu
    from maria_tpu.ops.program import build_tod_program

    plan = maria_tpu.get_plan(
        "five_second_stare", start_time=1.75e9, sample_rate=16, scan_center=(60.0, 45.0)
    )
    sim = maria_tpu.Simulation(
        instrument="AtLAST-SZ_mini", plans=plan, site="ALMA",
        atmosphere="3d", noise=True, seed=2,
    )
    program = build_tod_program(sim.obs_list[0], noise_kwargs=sim.noise_kwargs)
    fn = program.total_power_fn()
    txt = jax.jit(fn).lower(*program.example_args(), program.device_tables()).as_text()

    payloads = [
        len(m.group(1))
        for m in re.finditer(r"stablehlo\.constant dense<([^>]*)>", txt)
    ]
    assert max(payloads, default=0) < 100_000, (
        f"largest embedded constant is {max(payloads)} chars — "
        "a big table leaked back into the HLO as a closure constant"
    )


@pytest.mark.slow
def test_device_tables_path_matches_constants_path():
    """Passing the spectral tables as arguments must be bitwise-identical
    to the closure-constant path (they are the same arrays)."""
    import jax

    import maria_tpu
    from maria_tpu.ops.program import build_tod_program

    plan = maria_tpu.get_plan(
        "five_second_stare", start_time=1.75e9, sample_rate=16, scan_center=(60.0, 45.0)
    )
    sim = maria_tpu.Simulation(
        instrument="test/1deg", plans=plan, site="chajnantor",
        atmosphere="3d", noise=True, seed=5,
    )
    program = build_tod_program(sim.obs_list[0], noise_kwargs=sim.noise_kwargs)
    fn = program.total_power_fn()
    args = program.example_args()
    a = np.asarray(jax.jit(fn)(*args))
    b = np.asarray(jax.jit(fn)(*args, program.device_tables()))
    np.testing.assert_array_equal(a, b)
