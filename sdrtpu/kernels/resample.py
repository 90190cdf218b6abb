"""Polyphase arbitrary resampling, block-parallel.

Reimplements the math of ``dsp::multirate::PolyphaseResampler``
(``core/src/dsp/multirate/polyphase_resampler.h:69-99``) without the
sequential output loop.  The reference walks outputs one at a time:

    phase_k  = (k * decim) % interp
    offset_k = floor(k * decim / interp)
    y[k] = dot(buffer[offset_k : offset_k + T], bank[phase_k])

with ``bank[p][t] = taps[t*interp + (interp-1-p)]``
(``polyphase_bank.h:28-33``) and ``buffer`` carrying ``T-1`` history
samples.  All indices are affine in ``k``, so we compute every output of the
block at once: a gather of input frames and a gather of per-output tap rows,
contracted in one einsum (lowered to the MXU).

Block framing: with input block length n a multiple of ``decim``, the output
count is exactly ``n * interp / decim`` per block and the starting phase
returns to zero — shapes stay static and no phase carry is needed (the
constructor asserts this; the framing layer guarantees it).

``RationalResampler`` reproduces the reference's auto-planning
(``rational_resampler.h:120-165``): power-of-two pre-decimation, then a
gcd-reduced polyphase stage with an interp-scaled Nuttall lowpass.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.block import StreamOp
from . import taps as tapsmod
from .fir import MultistageDecimator


def build_polyphase_bank(interp: int, taps: np.ndarray) -> np.ndarray:
    """Split prototype taps into ``interp`` phases (``polyphase_bank.h``).

    Returns (interp, taps_per_phase) float32 with
    ``bank[p, t] = taps[t*interp + (interp-1-p)]`` (zero-padded).
    """
    interp = int(interp)
    tpp = -(-len(taps) // interp)
    padded = np.zeros(interp * tpp, dtype=np.float64)
    padded[: len(taps)] = np.asarray(taps, np.float64)
    bank = np.zeros((interp, tpp), dtype=np.float64)
    for i in range(interp * tpp):
        bank[(interp - 1) - (i % interp), i // interp] = padded[i]
    return bank.astype(np.float32)


class PolyphaseResampler(StreamOp):
    """L/M polyphase interpolator-decimator with static block shapes."""

    def __init__(self, interp: int, decim: int, taps: np.ndarray, dtype=jnp.complex64):
        self.interp = int(interp)
        self.decim = int(decim)
        self.dtype = dtype
        bank = build_polyphase_bank(self.interp, taps)
        self.taps_per_phase = bank.shape[1]
        self.bank = bank  # host numpy, embedded as constant at trace time
        self._index_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def init_state(self):
        return np.zeros((self.taps_per_phase - 1,), np.dtype(self.dtype))

    def out_len(self, n: int) -> int:
        assert (n * self.interp) % self.decim == 0, (
            f"block length {n} must make n*interp/decim integral "
            f"(interp={self.interp}, decim={self.decim})"
        )
        assert n % self.decim == 0 or (n * self.interp) % self.decim == 0
        return (n * self.interp) // self.decim

    def _indices(self, n: int):
        if n not in self._index_cache:
            n_out = self.out_len(n)
            k = np.arange(n_out, dtype=np.int64)
            phase = ((k * self.decim) % self.interp).astype(np.int32)
            offset = ((k * self.decim) // self.interp).astype(np.int32)
            self._index_cache[n] = (offset, phase)
        return self._index_cache[n]

    def __call__(self, state, x):
        n = x.shape[-1]
        offset, phase = self._indices(n)
        ext = jnp.concatenate([state, x.astype(self.dtype)])
        # frames[k, t] = ext[offset_k + t]  (ext already includes T-1 history,
        # so offset_k indexes the window start exactly like the reference's
        # &buffer[offset] dot product).
        t_idx = jnp.arange(self.taps_per_phase, dtype=jnp.int32)
        frames = ext[offset[:, None] + t_idx[None, :]]
        tap_rows = jnp.asarray(self.bank[phase])  # host gather: phase is static
        y = jnp.einsum(
            "kt,kt->k", frames.real, tap_rows, preferred_element_type=jnp.float32
        )
        if jnp.iscomplexobj(ext):
            yi = jnp.einsum(
                "kt,kt->k", frames.imag, tap_rows, preferred_element_type=jnp.float32
            )
            y = jax.lax.complex(y, yi)
        new_state = ext[n:] if self.taps_per_phase > 1 else state
        return new_state, y


class RationalResampler(StreamOp):
    """Auto-planned arbitrary rate conversion (``rational_resampler.h``).

    Plan: largest power-of-two pre-decimation (capped at 512 — our halfband
    cascade depth), then a gcd-reduced polyphase stage whose prototype is a
    Nuttall lowpass at min(in,out)/2 with 10% transition, scaled by interp.
    """

    MAX_PREDECIM = 512

    def __init__(self, in_samplerate: float, out_samplerate: float, dtype=jnp.complex64):
        self.in_samplerate = float(in_samplerate)
        self.out_samplerate = float(out_samplerate)
        self.dtype = dtype

        predec_power = 0
        if in_samplerate > out_samplerate:
            predec_power = min(
                int(math.floor(math.log2(in_samplerate / out_samplerate))),
                int(math.log2(self.MAX_PREDECIM)),
            )
        predec_ratio = 1 << predec_power
        int_samplerate = in_samplerate / predec_ratio if predec_power > 0 else in_samplerate

        int_sr = round(int_samplerate)
        out_sr = round(out_samplerate)
        g = math.gcd(int_sr, out_sr)
        interp = out_sr // g
        decim = int_sr // g

        actual_out = int_sr * interp / decim
        self.rate_error_pct = abs((actual_out - out_samplerate) / out_samplerate) * 100.0

        self.predecim = (
            MultistageDecimator(predec_ratio, dtype) if predec_power > 0 else None
        )
        self.interp = interp
        self.decim = decim
        if interp != decim:
            tap_sr = int_samplerate * interp
            bw = min(in_samplerate, out_samplerate) / 2.0
            rtaps = tapsmod.low_pass(bw, bw * 0.1, tap_sr) * np.float32(interp)
            self.resamp = PolyphaseResampler(interp, decim, rtaps, dtype)
        else:
            self.resamp = None

    def init_state(self):
        return (
            self.predecim.init_state() if self.predecim else (),
            self.resamp.init_state() if self.resamp else (),
        )

    def out_len(self, n: int) -> int:
        if self.predecim:
            n = self.predecim.out_len(n)
        if self.resamp:
            n = self.resamp.out_len(n)
        return n

    def block_multiple(self) -> int:
        """Smallest input block length quantum keeping all shapes static."""
        m = self.predecim.ratio if self.predecim else 1
        if self.resamp:
            d = self.resamp.decim // math.gcd(self.resamp.decim, self.resamp.interp)
            m *= d
        return m

    def __call__(self, state, x):
        st_d, st_r = state
        if self.predecim:
            st_d, x = self.predecim(st_d, x)
        if self.resamp:
            st_r, x = self.resamp(st_r, x)
        return (st_d, st_r), x
