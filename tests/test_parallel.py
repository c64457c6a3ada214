"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

The key invariant (SURVEY.md §4): sharded execution is numerically
equivalent to single-device execution, because the PRNG is
layout-invariant and the program has no cross-detector dependencies
outside the collectives.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import maria_tpu
from maria_tpu.ops.program import build_tod_program
from maria_tpu.parallel import create_mesh, mesh_shape_for


@pytest.fixture(scope="module")
def program():
    plan = maria_tpu.get_plan("five_second_stare", start_time=1.75e9, sample_rate=32, scan_center=(60.0, 45.0))
    sim = maria_tpu.Simulation(
        instrument="test/1deg", plans=plan, site="chajnantor", atmosphere="2d", noise=True, seed=1
    )
    return build_tod_program(sim.obs_list[0], noise_kwargs=sim.noise_kwargs)


def test_mesh_shapes():
    assert mesh_shape_for(8) in [(4, 2), (2, 4)]
    assert mesh_shape_for(1) == (1, 1)
    assert np.prod(mesh_shape_for(6)) == 6


def test_device_count():
    assert len(jax.devices()) == 8


def test_sharded_equals_unsharded(program):
    fn = program.total_power_fn()
    args = program.example_args()

    unsharded = np.asarray(jax.jit(fn)(*args))

    mesh = create_mesh(8)
    with mesh:
        sharded_fn = jax.jit(
            fn,
            in_shardings=(None, NamedSharding(mesh, P("det", None)), None, None),
            out_shardings=NamedSharding(mesh, P("det", "time")),
        )
        sharded = np.asarray(sharded_fn(*args))

    assert unsharded.shape == sharded.shape
    assert np.allclose(unsharded, sharded, rtol=1e-4, atol=1e-5)


def test_dryrun_entrypoint():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == 217
    assert not bool(jnp.isnan(out).any())
