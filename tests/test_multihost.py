"""Multi-host scaffolding, exercised degenerate (n_proc=1) on the
virtual 8-device CPU mesh — the code path a pod run takes, minus the
coordinator handshake (parallel/multihost.py docstring has the launch
recipe)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from maria_tpu.parallel.multihost import (
    create_multihost_mesh,
    host_local_shard,
    initialize_multihost,
    is_multihost,
    process_detector_range,
)


def test_initialize_is_noop_single_process(monkeypatch):
    monkeypatch.delenv("MARIA_TPU_MULTIHOST", raising=False)
    assert initialize_multihost() is False
    assert is_multihost() is False


def test_mesh_layout_dcn_outer():
    mesh = create_multihost_mesh()
    assert mesh.axis_names == ("dcn", "det", "time")
    # single slice -> degenerate size-1 DCN axis, all 8 devices inside
    assert mesh.devices.shape[0] == 1
    assert int(np.prod(mesh.devices.shape)) == len(jax.devices())


def test_mesh_explicit_dcn_split():
    # force a 2-group DCN layout on the CPU mesh: the shape math and
    # axis ordering are what a 2-slice pod run uses
    mesh = create_multihost_mesh(dcn_size=2)
    assert mesh.devices.shape[0] == 2
    assert int(np.prod(mesh.devices.shape[1:])) == len(jax.devices()) // 2


def test_process_detector_range_covers_all_rows():
    mesh = create_multihost_mesh()
    n_det = 1000
    start, stop = process_detector_range(n_det, mesh)
    # single process addresses every device -> the whole range
    assert (start, stop) == (0, n_det)


def test_host_local_shard_matches_global():
    """host_local_shard-assembled array == device_put of the global one,
    and a sharded computation over it matches unsharded."""
    mesh = create_multihost_mesh()
    n_det, n_t = 64, 48
    rng = np.random.default_rng(0)
    full = rng.standard_normal((n_det, n_t)).astype(np.float32)

    spec = P(("dcn", "det"), "time")
    x = host_local_shard(mesh, spec, (n_det, n_t), lambda idx: full[idx])
    assert x.shape == (n_det, n_t)
    np.testing.assert_array_equal(np.asarray(x), full)

    # the binning-style reduction: per-shard partial sums + psum,
    # inserted by XLA from the sharding annotations
    @jax.jit
    def total(v):
        return jnp.sum(v * v)

    sharded = float(total(x))
    unsharded = float(total(jnp.asarray(full)))
    np.testing.assert_allclose(sharded, unsharded, rtol=1e-5)


def test_host_local_shard_fill_sees_correct_slices():
    """fill() receives global index slices; every shard lands in the
    right place even with a nontrivial (dcn x det, time) layout."""
    mesh = create_multihost_mesh(dcn_size=2)
    n_det, n_t = 32, 16
    base = np.arange(n_det * n_t, dtype=np.float32).reshape(n_det, n_t)
    calls = []

    def fill(idx):
        calls.append(idx)
        return base[idx]

    x = host_local_shard(mesh, P(("dcn", "det"), "time"), (n_det, n_t), fill)
    np.testing.assert_array_equal(np.asarray(x), base)
    assert calls, "fill was never invoked"


def test_dcn_size_must_divide():
    with pytest.raises(ValueError):
        create_multihost_mesh(dcn_size=3)
