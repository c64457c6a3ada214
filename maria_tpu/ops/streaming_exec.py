"""Bounded-memory TOD synthesis: arbitrary observation length at
O(block) fine-rate memory.

The reference's flagship claim is "arbitrarily long periods of
atmospheric evolution" (maria README.rst:34-36), backed by an O(n) AR
extrusion and dask-lazy TOD fields (maria/tod/tod.py:63). The memory
wall in a device build is the FINE-rate (n_det, n_t) fields — AtLAST's
50k detectors for one hour at 50 Hz is ~36 GB/field in f32, far past
HBM. The coarse-rate stages are ~upsample_ratio x smaller and cheap to
keep whole.

So the executor splits the fused program at the coarse/fine boundary:

- ONE whole-observation coarse stage (`TODProgram._loadings(upto=
  "coarse")`): pointing, screen synthesis, AR extrusion, LOS sampling,
  bandpass integration -> loading_c (n_det, n_tc). Identical numbers to
  the batch program (same key, same ops).
- FINE-rate synthesis in fixed blocks of `block_tc` coarse cells: the
  phase-stencil cubic upsample runs per block on a haloed coarse slice
  (bitwise-equal to the full upsample — tested), detector noise comes
  from the streaming pink cascade (noise/streaming.py), gains multiply,
  and each block is binned straight into carried (map_sum, map_wgt)
  accumulators. Nothing of size (n_det, n_t) ever exists.

Chunk-invariance: every block depends only on (carried state, block
index), so any grouping of blocks per dispatch gives identical results
(`run(group_size=1) == run(group_size=n_blocks)`, tested exactly).

The noise model is the streaming cascade, not the batch FFT: the two
match in PSD (tested) but not sample-by-sample — a streaming generator
cannot reproduce a circulant whole-observation FFT draw.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..coords.transforms import offsets_to_phi_theta, phi_theta_to_offsets_jit
from ..noise.streaming import StreamingBandNoise
from .binning import bin_scatter

__all__ = [
    "StreamingExecutor",
    "upsample_block_phases",
    "pad_coarse_for_blocks",
    "StreamingResult",
]


def pad_coarse_for_blocks(values, block_tc: int, n_blocks: int):
    """Clamp-pad a coarse (..., n_c) series for `upsample_block_phases`:
    one left edge clamp plus enough right clamps that the LAST block's
    dynamic_slice never hits the array end (dynamic_slice clamps the
    start index, which would silently shift the stencil)."""
    n_c = values.shape[-1]
    n_right = n_blocks * block_tc + 2 - n_c
    right = jnp.repeat(values[..., -1:], n_right, axis=-1)
    return jnp.concatenate([values[..., :1], values, right], axis=-1)


def upsample_block_phases(values_pad, c0, block_tc: int, ratio: int, n_c: int, v_last, kind="cubic"):
    """Blockwise `upsample_time_phases`, bitwise-equal on the block.

    `values_pad` is the coarse array padded once OUTSIDE the block loop:
    [v[0], v..., v[-1], v[-1]] (one left clamp, two right clamps), shape
    (..., n_c + 3). The block covers coarse cells [c0, c0 + block_tc);
    fine samples past cell n_c - 2 replicate the last coarse value,
    matching the full version's tail extension."""
    sl = jax.lax.dynamic_slice_in_dim(values_pad, c0, block_tc + 3, axis=-1)
    dtype = values_pad.dtype
    s = (jnp.arange(ratio, dtype=dtype) / ratio)[None, :]
    p0 = sl[..., 0:block_tc, None]
    p1 = sl[..., 1 : block_tc + 1, None]
    p2 = sl[..., 2 : block_tc + 2, None]
    p3 = sl[..., 3 : block_tc + 3, None]
    if kind == "linear" or n_c < 4:
        out = p1 * (1 - s) + p2 * s
    else:
        out = 0.5 * (
            2 * p1
            + (-p0 + p2) * s
            + (2 * p0 - 5 * p1 + 4 * p2 - p3) * s**2
            + (-p0 + 3 * p1 - 3 * p2 + p3) * s**3
        )
    out = out.reshape(*out.shape[:-2], block_tc * ratio)
    # tail: fine j >= (n_c - 1) * ratio repeats the last coarse value
    g = c0 * ratio + jnp.arange(block_tc * ratio)
    return jnp.where(g >= (n_c - 1) * ratio, v_last[..., None], out)


@dataclass
class StreamingResult:
    """Accumulated products of a streaming run (units: pW)."""

    map_sum: np.ndarray  # (n_y, n_x) sum of TOD power per pixel
    map_wgt: np.ndarray  # (n_y, n_x) hit counts
    n_samples: int
    n_x: int
    n_y: int
    center: tuple
    res: float
    # per-band Welch noise spectra (ML-mapper noise statistics without
    # ever holding the full TOD): mean detrended+Hann periodogram over
    # blocks and band detectors, one-sided, pW^2/Hz
    psd_freqs: np.ndarray = None  # (B//2 + 1,)
    psds: list = None  # [(n_freq,) per band]

    @property
    def map(self):
        with np.errstate(invalid="ignore"):
            return np.where(self.map_wgt > 0, self.map_sum / self.map_wgt, np.nan)


class StreamingExecutor:
    """Time-blocked executor over a TODProgram (see module docstring).

    Supports the atmosphere + noise (+ gains) pipeline — the memory-
    relevant fields. Static-sky stages (cmb=/map=) hold whole-observation
    timelines by construction and are rejected with a clear error.
    """

    def __init__(
        self,
        program,
        obs=None,
        block_tc: int = 64,
        n_x: int = 128,
        n_y: int = 128,
        res: float = None,
        center: tuple = None,
        T_ref: float = None,
    ):
        if program.upsample_ratio is None:
            raise ValueError(
                "StreamingExecutor needs an integer coarse/fine upsample ratio "
                "(aligned uniform grids); this program has none."
            )
        if any(b.cmb_samples is not None or b.map_stages for b in program.bands):
            raise NotImplementedError(
                "StreamingExecutor streams atmosphere + noise; cmb=/map= stages "
                "hold whole-observation sky timelines — run those through the "
                "batch program, or bin them separately."
            )
        self.program = program
        self.r = int(program.upsample_ratio)
        self.block_tc = int(block_tc)
        self.B = self.block_tc * self.r
        self.n_t = len(program.t_fine)
        self.n_c = len(program.t_coarse)
        self.n_det = len(program.offsets)
        self.n_blocks = -(-self.n_t // self.B)
        duration = float(program.t_fine[-1] - program.t_fine[0]) + 1.0
        T_ref = T_ref or max(4096.0, 2.0 * duration)

        # fine boresight track (exact pointing, host; O(n_t) scalars)
        if obs is not None:
            bs_az_f = np.asarray(obs.boresight.az, dtype=np.float32)
            bs_el_f = np.asarray(obs.boresight.el, dtype=np.float32)
        else:  # fall back to upsampling the program's coarse track
            from .interp import upsample_time

            t_c = jnp.asarray(program.t_coarse, dtype=jnp.float32)
            t_f = jnp.asarray(program.t_fine, dtype=jnp.float32)
            bs_az_f = np.asarray(upsample_time(jnp.asarray(program.bs_az_coarse), t_c, t_f))
            bs_el_f = np.asarray(upsample_time(jnp.asarray(program.bs_el_coarse), t_c, t_f))
        pad_f = self.n_blocks * self.B - self.n_t
        self.bs_az_f = np.pad(bs_az_f, (0, pad_f), mode="edge")
        self.bs_el_f = np.pad(bs_el_f, (0, pad_f), mode="edge")

        # map geometry (defaults sized from the detector hull like bench)
        self.n_x, self.n_y = int(n_x), int(n_y)
        c_az = center[0] if center else float(np.mean(np.asarray(program.bs_az_coarse)))
        c_el = center[1] if center else float(np.mean(np.asarray(program.bs_el_coarse)))
        self.center = (c_az, c_el)
        if res is None:
            # bound every det x time sample: hull detectors x a coarse
            # boresight subsample, with margin for the skipped samples
            step = max(1, len(self.bs_az_f) // 1024)
            pt = np.asarray(
                offsets_to_phi_theta(
                    program.offsets[:, None, :].astype(np.float32),
                    jnp.asarray(self.bs_az_f[::step]),
                    jnp.asarray(self.bs_el_f[::step]),
                )
            )
            offs = np.asarray(phi_theta_to_offsets_jit(jnp.asarray(pt), c_az, c_el))
            half = float(np.abs(offs).max()) * 1.05 + 1e-6
            res = 2 * half / self.n_x
        self.res = float(res)

        self.noise_models = [
            StreamingBandNoise(
                program.sample_rate, b.knee, basis=b.noise_basis,
                corr_prop=b.corr_prop, T_ref=T_ref,
            )
            for b in program.bands
        ]
        self._block_fn_cache = {}

    # ------------------------------------------------------------------
    def init_state(self, key):
        """(coarse fields, per-band noise states, gains) for one realization."""
        p = self.program
        tables = p.device_tables()
        coarse = jax.jit(lambda k, o, a, e, tb: p._loadings(k, o, a, e, upto="coarse", tables=tb))(
            *p.example_args(key), tables
        )
        # gains: same stream as the batch program (total_power_fn)
        key_gain = jax.random.split(key, 3)[2]
        gains = (
            jnp.exp(
                jnp.asarray(p.gain_error, dtype=jnp.float32)
                * jax.random.normal(key_gain, (self.n_det,))
            )[:, None]
            if p.gain_error is not None
            else jnp.ones((self.n_det, 1), dtype=jnp.float32)
        )
        key_noise = jax.random.split(key, 3)[1]
        noise_states, noise_keys = [], []
        for i, (band, model) in enumerate(zip(p.bands, self.noise_models)):
            band_key = jax.random.fold_in(key_noise, i)
            key_init, key_stream = jax.random.split(band_key)
            noise_states.append(model.init_state(key_init, len(band.det_index)))
            noise_keys.append(key_stream)
        # coarse loading padded once for the haloed blockwise upsample
        lc = coarse["loading_c"]
        lc_pad = pad_coarse_for_blocks(lc, self.block_tc, self.n_blocks)
        return {
            "lc_pad": lc_pad,
            "lc_last": lc[:, -1],
            "gains": gains,
            "noise": noise_states,
            "noise_keys": noise_keys,
            "map_sum": jnp.zeros((self.n_y * self.n_x,), dtype=jnp.float32),
            "map_wgt": jnp.zeros((self.n_y * self.n_x,), dtype=jnp.float32),
            # Welch accumulators (only updated when run(accumulate_psd=True))
            "psd_sum": [
                jnp.zeros((self.B // 2 + 1,), dtype=jnp.float32) for _ in p.bands
            ],
            "psd_blocks": jnp.float32(0.0),
        }

    # ------------------------------------------------------------------
    def _make_block_fn(self, with_tod: bool, with_psd: bool = False):
        p = self.program
        r, B, block_tc = self.r, self.B, self.block_tc
        n_c, n_t, n_det = self.n_c, self.n_t, self.n_det
        n_x, n_y, res = self.n_x, self.n_y, self.res
        c_az, c_el = self.center
        offsets = jnp.asarray(p.offsets, dtype=jnp.float32)
        half = res * n_x / 2

        def block_fn(state, xs):
            b, bs_az_b, bs_el_b = xs
            c0 = b * block_tc

            atm = upsample_block_phases(
                state["lc_pad"], c0, block_tc, r, n_c, state["lc_last"], kind="cubic"
            )
            tod = atm * state["gains"]

            # streaming noise per band (NEP_per_loading sees this block's
            # non-noise loading, mirroring the batch program)
            if p.with_noise:
                noise_pieces, new_states = {}, []
                for i, (band, model) in enumerate(zip(p.bands, self.noise_models)):
                    key_b = jax.random.fold_in(state["noise_keys"][i], b)
                    st, unscaled = model.block(
                        state["noise"][i], key_b, len(band.det_index), B
                    )
                    new_states.append(st)
                    if band.NEP_per_loading:
                        total_NEP = band.NEP + band.NEP_per_loading * 1e-12 * tod[band.det_sel]
                    else:
                        total_NEP = band.NEP
                    noise_pieces[i] = 1e12 * total_NEP * unscaled
                tod = tod + p._per_band_assemble(noise_pieces, (n_det, B))
            else:
                new_states = state["noise"]

            # bin the block straight into the carried map (pW sums)
            pt = offsets_to_phi_theta(offsets[:, None, :], bs_az_b, bs_el_b)
            offs = phi_theta_to_offsets_jit(pt, c_az, c_el)
            ix = jnp.floor((offs[..., 0] + half) / res).astype(jnp.int32)
            iy = jnp.floor((offs[..., 1] + half) / res).astype(jnp.int32)
            g = c0 * r + jnp.arange(B)
            inside = (
                (ix >= 0) & (ix < n_x) & (iy >= 0) & (iy < n_y) & (g < n_t)[None, :]
            )
            pix = jnp.where(inside, iy * n_x + ix, n_y * n_x)  # overflow bucket
            w = inside.astype(jnp.float32)
            map_sum = state["map_sum"] + bin_scatter(tod * w, pix, n_y * n_x + 1)[:-1]
            map_wgt = state["map_wgt"] + bin_scatter(w, pix, n_y * n_x + 1)[:-1]

            new_state = dict(state, noise=new_states, map_sum=map_sum, map_wgt=map_wgt)

            if with_psd:
                # Welch: detrended + Hann-windowed per-band periodograms,
                # mean over band detectors; partial tail blocks excluded
                # (their padded samples would bias the spectrum)
                full = ((b + 1) * B <= n_t).astype(jnp.float32)
                hann = 0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(B) / B)
                norm = 2.0 / (p.sample_rate * jnp.sum(hann**2))
                psd_sum = []
                for i, band in enumerate(p.bands):
                    x = tod[band.det_sel]
                    x = x - x.mean(axis=-1, keepdims=True)
                    spec = jnp.abs(jnp.fft.rfft(x * hann, axis=-1)) ** 2
                    psd_sum.append(
                        state["psd_sum"][i] + full * norm * spec.mean(axis=0)
                    )
                new_state["psd_sum"] = psd_sum
                new_state["psd_blocks"] = state["psd_blocks"] + full
            return new_state, (tod if with_tod else ())

        return block_fn

    def _group_fn(self, with_tod: bool, with_psd: bool = False):
        # ONE jit per mode; jit re-specializes per group length
        key = (with_tod, with_psd)
        if key not in self._block_fn_cache:
            block_fn = self._make_block_fn(with_tod, with_psd)

            @jax.jit
            def run_group(state, bs, az, el):
                return jax.lax.scan(block_fn, state, (bs, az, el))

            self._block_fn_cache[key] = run_group
        return self._block_fn_cache[key]

    def _shard_state(self, state, mesh):
        """Lay the carried state out over the mesh's det axis: every
        detector-major leaf shards P("det", ...); map accumulators and
        scalars replicate. XLA propagates the shardings through the
        block scan (segment-sum binning picks up the cross-shard psum
        automatically)."""
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        band_rows = {len(b.det_index) for b in self.program.bands}

        def put(x):
            if hasattr(x, "ndim") and x.ndim >= 1 and (
                x.shape[0] == self.n_det or x.shape[0] in band_rows
            ):
                spec = P("det", *[None] * (x.ndim - 1))
            else:
                spec = P()
            return jax.device_put(x, NamedSharding(mesh, spec))

        return jax.tree.map(put, state)

    # ------------------------------------------------------------------
    def run(
        self, key=None, group_size: int = 8, mesh=None, accumulate_psd: bool = False
    ) -> StreamingResult:
        """Synthesize + bin the whole observation, `group_size` blocks
        per device dispatch, state carried between dispatches. Pass a
        ("det", ...) `mesh` to shard the detector axis across chips —
        the streamed map then reduces with an XLA-inserted psum and the
        result equals the single-device run (tested). Det sharding needs
        equal shards: call `program.pad_detectors(n_det_shards)` before
        building the executor."""
        state = self.init_state(key if key is not None else jax.random.key(0))
        if mesh is not None:
            state = self._shard_state(state, mesh)
        for state in self._iterate(state, group_size, with_tod=False, with_psd=accumulate_psd):
            pass
        psd_freqs = psds = None
        if accumulate_psd:
            n_blocks = max(float(state["psd_blocks"]), 1.0)
            psd_freqs = np.fft.rfftfreq(self.B, d=1.0 / self.program.sample_rate)
            psds = [np.asarray(s) / n_blocks for s in state["psd_sum"]]
        return StreamingResult(
            map_sum=np.asarray(state["map_sum"]).reshape(self.n_y, self.n_x),
            map_wgt=np.asarray(state["map_wgt"]).reshape(self.n_y, self.n_x),
            n_samples=self.n_det * self.n_t,
            n_x=self.n_x, n_y=self.n_y, center=self.center, res=self.res,
            psd_freqs=psd_freqs, psds=psds,
        )

    def tod_blocks(self, key=None, group_size: int = 1):
        """Yield (block_index, tod_block (n_det, <=B) pW) in stream order
        — the lazy-TOD analogue of the reference's dask fields."""
        state = self.init_state(key if key is not None else jax.random.key(0))
        b = 0
        for state, tods in self._iterate(state, group_size, with_tod=True, yield_tod=True):
            for tod in tods:
                hi = min(self.B, self.n_t - b * self.B)
                yield b, np.asarray(tod)[:, :hi]
                b += 1

    def _iterate(
        self, state, group_size: int, with_tod: bool, yield_tod: bool = False,
        with_psd: bool = False,
    ):
        run_group = self._group_fn(with_tod, with_psd)
        az = self.bs_az_f.reshape(self.n_blocks, self.B)
        el = self.bs_el_f.reshape(self.n_blocks, self.B)
        for g0 in range(0, self.n_blocks, group_size):
            g1 = min(g0 + group_size, self.n_blocks)
            bs = jnp.arange(g0, g1)
            state, tods = run_group(
                state, bs, jnp.asarray(az[g0:g1]), jnp.asarray(el[g0:g1])
            )
            if yield_tod:
                yield state, tods
            else:
                yield state
