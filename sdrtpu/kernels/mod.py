"""Transmit-side modulators (``core/src/dsp/mod/*.h``, used by ryfi/M17).

- `QuadratureMod` — FM modulator: ``phase += dev*x; out = e^{j phase}``
  (``mod/quadrature.h:38-44``).  The phase accumulator is a plain cumsum —
  an associative scan — so the whole block is parallel.
- `RrcInterpolator` — symbol upsampling with root-raised-cosine pulse
  shaping (``multirate/rrc_interpolator.h``): an interp-by-L polyphase
  with an RRC prototype.
- `PskMod` — symbols -> RRC-shaped complex baseband (``mod/psk.h``).
- `GfskMod` — bits(+/-1) -> RRC-shaped freq pulse -> FM (``mod/gfsk.h``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.block import StreamOp
from . import taps as tapsmod
from .resample import PolyphaseResampler


class QuadratureMod(StreamOp):
    """FM modulator: real input -> constant-envelope complex baseband."""

    def __init__(self, deviation_hz: float, samplerate: float):
        self.dev = np.float32(tapsmod.hz_to_rads(deviation_hz, samplerate))

    def init_state(self):
        return np.float32(0.0)

    # chunk length for the two-level wrapped cumsum: within-chunk phase
    # stays < ~CHUNK*pi rad, where float32 spacing is ~1e-5 rad — a raw
    # full-block cumsum reaches ~1e6 rad on 1 MSample blocks, where
    # float32 spacing is 0.125 rad (degrees of phasor wobble)
    _CHUNK = 64

    def __call__(self, state, x):
        n = x.shape[-1]
        d = self.dev * x
        K = self._CHUNK
        if n % K:
            pad = [(0, 0)] * (x.ndim - 1) + [(0, K - n % K)]
            d = jnp.pad(d, pad)
        nc = d.shape[-1] // K
        dc = d.reshape(d.shape[:-1] + (nc, K))
        within = jnp.cumsum(dc, axis=-1)  # (..., nc, K), magnitude < K*pi
        # chunk offsets: wrapped running sum of per-chunk totals (exact
        # mod arithmetic on small numbers — no precision loss)
        totals = within[..., -1]

        def body(c, t):
            return jnp.mod(c + t, np.float32(2 * np.pi)), c

        c0 = jnp.broadcast_to(
            jnp.asarray(state, jnp.float32), totals[..., 0].shape
        )
        carry, offs = jax.lax.scan(body, c0, jnp.moveaxis(totals, -1, 0))
        offs = jnp.moveaxis(offs, 0, -1)  # (..., nc), each in [0, 2pi)
        phase = (offs[..., None] + within).reshape(d.shape)[..., :n]
        new_state = jnp.mod(
            carry + np.pi, np.float32(2 * np.pi)
        ) - np.float32(np.pi)
        return new_state, jax.lax.complex(jnp.cos(phase), jnp.sin(phase))


class RrcInterpolator(StreamOp):
    """Interpolate symbols by an integer factor with RRC shaping."""

    def __init__(
        self,
        sps: int,
        rrc_tap_count: int = 33,
        rrc_beta: float = 0.35,
        dtype=jnp.complex64,
        normalize_dc: bool = False,
    ):
        self.sps = int(sps)
        proto = tapsmod.root_raised_cosine(rrc_tap_count, rrc_beta, float(sps))
        # normalize_dc: unit DC gain, the ryfi TX convention
        # (``ryfi/transmitter.cpp:11-19``); default keeps unity symbol
        # gain through the zero-stuffing interpolation (* sps).
        scale = 1.0 / float(proto.sum()) if normalize_dc else float(self.sps)
        self.poly = PolyphaseResampler(
            self.sps, 1, proto * np.float32(scale), dtype=dtype
        )

    def init_state(self):
        return self.poly.init_state()

    def out_len(self, n: int) -> int:
        return n * self.sps

    def __call__(self, state, syms):
        return self.poly(state, syms)


class PskMod(StreamOp):
    """Complex symbols -> RRC-shaped baseband at ``sps`` samples/symbol."""

    def __init__(self, sps: int, rrc_tap_count: int = 33, rrc_beta: float = 0.35):
        self.interp = RrcInterpolator(sps, rrc_tap_count, rrc_beta, jnp.complex64)

    def init_state(self):
        return self.interp.init_state()

    def out_len(self, n):
        return self.interp.out_len(n)

    def __call__(self, state, syms):
        return self.interp(state, syms.astype(jnp.complex64))


class GfskMod(StreamOp):
    """+/-1 bit pulses -> RRC-shaped frequency pulse -> FM baseband."""

    def __init__(
        self,
        sps: int,
        deviation_hz: float,
        samplerate: float,
        rrc_tap_count: int = 33,
        rrc_beta: float = 0.35,
    ):
        self.interp = RrcInterpolator(sps, rrc_tap_count, rrc_beta, jnp.float32)
        self.mod = QuadratureMod(deviation_hz, samplerate)

    def init_state(self):
        return {"interp": self.interp.init_state(), "mod": self.mod.init_state()}

    def out_len(self, n):
        return self.interp.out_len(n)

    def __call__(self, state, bits):
        st = dict(state)
        st["interp"], pulse = self.interp(state["interp"], bits.astype(jnp.float32))
        st["mod"], y = self.mod(state["mod"], pulse)
        return st, y
