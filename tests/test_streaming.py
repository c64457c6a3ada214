"""Streaming / time-sharded turbulence (reference behavior anchor:
maria/atmosphere/process.py:191-209 — O(n) extrusion of arbitrarily
long observations; SURVEY §5 long-context: shard t across devices and
ppermute the AR boundary rows between neighbors)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maria_tpu.atmosphere.process import AutoregressiveProcess, _ar_extrude_noise
from maria_tpu.atmosphere.streaming import StreamingExtrusion, extrude_time_sharded
from maria_tpu.parallel import create_mesh


@pytest.fixture(scope="module")
def process():
    ny = 12
    cross = np.stack([10.0 * np.arange(ny), np.full(ny, 500.0)], axis=-1)
    p = AutoregressiveProcess(
        cross_section=cross, extrusion=10.0 * np.arange(24),
        callback_kwargs={"nu": 5 / 6, "r0": 300.0},
    )
    p.run_setup()
    return p


def test_chunked_stream_matches_one_long_extrusion(process):
    """Chunked extrusion with a carried standing buffer must be BITWISE
    identical to one long extrusion fed the same innovations."""
    R = 16
    n_chunks = 3
    stream = StreamingExtrusion(process, chunk_rows=R)
    key = jax.random.key(0)
    key_init, key_noise = jax.random.split(key)

    state0 = stream.initial_state(key_init)
    noises = [
        jax.random.normal(jax.random.fold_in(key_noise, c), (R, process.n_live_edge), dtype=jnp.float32)
        for c in range(n_chunks)
    ]

    # one long extrusion: rows ordered newest-first; innovations consumed
    # newest-row-first, so the concatenated chunk noise IS the long noise
    long_noise = jnp.concatenate(noises)
    long_buffer = jnp.concatenate(
        [jnp.zeros((n_chunks * R, process.n_cross_section), dtype=jnp.float32), state0]
    )
    long_buffer = _ar_extrude_noise(
        process.A, process.B, long_buffer, process._ext_idx, process._cross_idx, long_noise
    )
    long_rows = np.asarray(long_buffer[: n_chunks * R])

    state = state0
    for c in range(n_chunks):
        state, chunk = stream.step(state, noises[c])
        start = (n_chunks - 1 - c) * R
        # chunks come out in stream order (oldest row first); the long
        # buffer is newest-first
        np.testing.assert_array_equal(np.asarray(chunk)[::-1], long_rows[start : start + R])


def test_time_sharded_halo_exchange_matches_sequential(process):
    """A time-sharded extrusion over an 8-device mesh (standing buffer
    ppermuted shard-to-shard) must equal the sequential stream."""
    mesh = create_mesh(8, axis_names=("time",), shape=(8,))
    R = 16
    key = jax.random.key(7)

    sharded = np.asarray(extrude_time_sharded(process, key, chunk_rows=R, mesh=mesh))

    stream = StreamingExtrusion(process, chunk_rows=R)
    chunks = stream.run_chunks(key, n_chunks=8)
    sequential = np.concatenate([np.asarray(c) for c in chunks])

    np.testing.assert_array_equal(sharded, sequential)


@pytest.mark.slow
def test_streaming_statistics(process):
    """Long streamed screens keep unit variance and the Matérn
    correlation across chunk boundaries (no seams). All realizations run
    in ONE vmapped dispatch (a python loop of 160 chunk steps took ~100 s
    of pure dispatch overhead on the CPU test mesh)."""
    R = 24
    stream = StreamingExtrusion(process, chunk_rows=R)

    def one_realization(key):
        key_init, key_noise = jax.random.split(key)
        state = stream.initial_state(key_init)
        out = []
        for c in range(4):
            noise = jax.random.normal(
                jax.random.fold_in(key_noise, c), (R, process.n_live_edge), dtype=jnp.float32
            )
            state, chunk = stream.step(state, noise)
            out.append(chunk)
        return jnp.concatenate(out)

    # the screen is only ~2 Matérn correlation lengths across, so each
    # realization contributes few effective samples; 256 realizations in
    # one dispatch put the variance s.e. near 0.05
    keys = jax.random.split(jax.random.key(100), 256)
    v = np.asarray(jax.jit(jax.vmap(one_realization))(keys))  # (n_real, 4R, ny)
    assert abs(v.var() - 1.0) < 0.15

    # adjacent-row correlation across every chunk boundary matches the
    # within-chunk one (the stream is stationary through the seam)
    def adj_corr(a, b):
        x, y = v[:, a].ravel(), v[:, b].ravel()
        return np.corrcoef(x, y)[0, 1]

    within = adj_corr(R // 2, R // 2 + 1)
    across = adj_corr(R - 1, R)  # chunk 0 / chunk 1 boundary (newest-first order)
    assert abs(within - across) < 0.1, (within, across)
