"""NFM / AM / SSB / CW demodulators.

Block-parallel reformulations of ``core/src/dsp/demod/{fm,am,ssb,cw}.h``:

- `Fm` (NFM): quadrature discriminator at deviation = bandwidth/2 plus an
  optional audio lowpass (cutoff bw/2, 10% transition) — ``fm.h``.
- `Am`: optional carrier AGC (complex), magnitude, DC block, optional audio
  AGC, lowpass — ``am.h:86-115``.  AGC parameters mirror the radio module's
  defaults (setPoint 1, attack 50/fs, decay 5/fs, maxGain 1e7, maxOut 10,
  initGain inf ⇒ amp starts at 0) — ``demodulators/am.h:34``.
- `Ssb`: translate by ±bw/2 (USB/LSB; DSB untranslated), take the real
  part, audio AGC — ``ssb.h:63-77``.
- `Cw`: translate by the CW tone offset, real, AGC — ``cw.h``.

All demods output mono float32 at the IF sample rate; the radio app layer
duplicates to stereo and resamples (``radio_module.h:98-110``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..graph.block import StreamOp
from . import taps as tapsmod
from .demod import Quadrature
from .fir import Fir
from .iir import DcBlocker
from .loops import Agc
from .mixer import FreqXlator


def _audio_agc(samplerate: float, attack: float = 50.0, decay: float = 5.0) -> Agc:
    return Agc(
        set_point=1.0,
        attack=attack / samplerate,
        decay=decay / samplerate,
        max_gain=10e6,
        max_output_amp=10.0,
        init_gain=np.inf,
    )


class Fm(StreamOp):
    """Narrowband FM demod (``demod/fm.h``): IF rate 50 kHz in the radio."""

    def __init__(self, samplerate: float, bandwidth: float, low_pass: bool = True):
        self.quad = Quadrature(bandwidth / 2.0, samplerate)
        self.low_pass = low_pass
        if low_pass:
            self.lpf = Fir(
                tapsmod.low_pass(bandwidth / 2.0, bandwidth * 0.05, samplerate),
                dtype=jnp.float32,
            )

    def init_state(self):
        return {
            "quad": self.quad.init_state(),
            "lpf": self.lpf.init_state() if self.low_pass else (),
        }

    def __call__(self, state, x):
        st = dict(state)
        st["quad"], y = self.quad(state["quad"], x)
        if self.low_pass:
            st["lpf"], y = self.lpf(state["lpf"], y)
        return st, y


class Am(StreamOp):
    """AM envelope demod (``demod/am.h``): IF rate 15 kHz in the radio."""

    def __init__(
        self,
        samplerate: float,
        bandwidth: float,
        agc_mode: str = "audio",  # "carrier" | "audio"
        agc_attack: float = 50.0,
        agc_decay: float = 5.0,
        dc_block_rate: float | None = None,
    ):
        assert agc_mode in ("carrier", "audio")
        self.agc_mode = agc_mode
        self.carrier_agc = _audio_agc(samplerate, agc_attack, agc_decay)
        self.audio_agc = _audio_agc(samplerate, agc_attack, agc_decay)
        rate = dc_block_rate if dc_block_rate is not None else 100.0 / samplerate
        self.dc_block = DcBlocker(rate, dtype=jnp.float32)
        self.lpf = Fir(
            tapsmod.low_pass(bandwidth / 2.0, bandwidth * 0.05, samplerate),
            dtype=jnp.float32,
        )

    def init_state(self):
        return {
            "cagc": self.carrier_agc.init_state(),
            "aagc": self.audio_agc.init_state(),
            "dc": self.dc_block.init_state(),
            "lpf": self.lpf.init_state(),
        }

    def __call__(self, state, x):
        st = dict(state)
        if self.agc_mode == "carrier":
            st["cagc"], x = self.carrier_agc(state["cagc"], x)
        y = jnp.abs(x).astype(jnp.float32)
        st["dc"], y = self.dc_block(state["dc"], y)
        if self.agc_mode == "audio":
            st["aagc"], y = self.audio_agc(state["aagc"], y)
        st["lpf"], y = self.lpf(state["lpf"], y)
        return st, y


class Ssb(StreamOp):
    """SSB/DSB demod (``demod/ssb.h``): IF rate 24 kHz in the radio."""

    def __init__(
        self,
        samplerate: float,
        bandwidth: float,
        mode: str = "usb",  # "usb" | "lsb" | "dsb"
        agc_attack: float = 50.0,
        agc_decay: float = 5.0,
    ):
        assert mode in ("usb", "lsb", "dsb")
        translation = {"usb": bandwidth / 2.0, "lsb": -bandwidth / 2.0, "dsb": 0.0}[
            mode
        ]
        self.xlator = FreqXlator(translation, samplerate)
        self.agc = _audio_agc(samplerate, agc_attack, agc_decay)

    def init_state(self):
        return {"xl": self.xlator.init_state(), "agc": self.agc.init_state()}

    def __call__(self, state, x):
        st = dict(state)
        st["xl"], y = self.xlator(state["xl"], x)
        y = y.real
        st["agc"], y = self.agc(state["agc"], y)
        return st, y


class Cw(StreamOp):
    """CW demod with audible tone offset (``demod/cw.h``): IF rate 3 kHz."""

    def __init__(
        self,
        samplerate: float,
        tone: float = 800.0,
        agc_attack: float = 50.0,
        agc_decay: float = 5.0,
    ):
        self.xlator = FreqXlator(tone, samplerate)
        self.agc = _audio_agc(samplerate, agc_attack, agc_decay)

    def init_state(self):
        return {"xl": self.xlator.init_state(), "agc": self.agc.init_state()}

    def __call__(self, state, x):
        st = dict(state)
        st["xl"], y = self.xlator(state["xl"], x)
        y = y.real
        st["agc"], y = self.agc(state["agc"], y)
        return st, y
