"""Radio chain: the per-VFO demodulation stack of the reference's radio
module (``decoder_modules/radio/src/radio_module.h``).

Structure (``radio_module.h:85-110``):

    VFO IQ @ IF rate
      -> IF chain: [NoiseBlanker] [PowerSquelch] [FmIfNoiseReduction]
      -> Demodulator (per mode)
      -> AF chain: [CTCSS] Resampler(IF->audio) [HPF 300 Hz] [Deemphasis]
      -> audio @ audio_rate

Per-mode constants from the reference demodulators
(``demodulators/{wfm,nfm,am,usb,lsb,dsb,cw}.h``):

| mode | IF rate | default bw | deemphasis |
|------|---------|-----------|------------|
| wfm  | 250 kHz | 150 kHz   | 50 us      |
| nfm  | 50 kHz  | 12.5 kHz  | off        |
| am   | 15 kHz  | 10 kHz    | off        |
| usb  | 24 kHz  | 2.8 kHz   | off        |
| lsb  | 24 kHz  | 2.8 kHz   | off        |
| dsb  | 24 kHz  | 4.6 kHz   | off        |
| cw   | 3 kHz   | 200 Hz    | off        |
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..graph.block import StreamOp
from ..kernels import taps as tapsmod
from ..kernels.analog import Am, Cw, Fm, Ssb
from ..kernels.fir import Fir
from ..kernels.iir import Deemphasis
from ..kernels.resample import RationalResampler
from ..kernels.fmnr import FmIfNoiseReduction
from ..kernels.squelch import NoiseBlanker, PowerSquelch
from ..kernels.wfm import BroadcastFm

MODE_INFO = {
    "wfm": dict(if_rate=250000.0, bandwidth=150000.0, deemp=50e-6),
    "nfm": dict(if_rate=50000.0, bandwidth=12500.0, deemp=None),
    "am": dict(if_rate=15000.0, bandwidth=10000.0, deemp=None),
    "usb": dict(if_rate=24000.0, bandwidth=2800.0, deemp=None),
    "lsb": dict(if_rate=24000.0, bandwidth=2800.0, deemp=None),
    "dsb": dict(if_rate=24000.0, bandwidth=4600.0, deemp=None),
    "cw": dict(if_rate=3000.0, bandwidth=200.0, deemp=None),
    # RAW: IQ passthrough at the audio rate (I->L, Q->R), radio_module's
    # RAW demod ("demodulators/raw.h": IF rate = audio samplerate)
    "raw": dict(if_rate=48000.0, bandwidth=48000.0, deemp=None),
}


class RadioChain(StreamOp):
    """One VFO's radio: IF conditioning + demod + AF processing.

    Input: complex IQ at ``MODE_INFO[mode]['if_rate']``.
    Output: (2, n_audio) stereo float32 at ``audio_rate``.
    """

    def __init__(
        self,
        mode: str,
        audio_rate: float = 48000.0,
        bandwidth: float | None = None,
        squelch_db: float | None = None,
        noise_blanker: bool = False,
        high_pass: bool = False,
        fm_if_nr: bool = False,
        deemphasis: float | None = "default",
        stereo: bool = True,
        rds: bool = False,
        ctcss_tone: int | None = None,
        pilot_mode: str = "normalized",
    ):
        info = dict(MODE_INFO[mode])
        if mode == "raw":
            info["if_rate"] = float(audio_rate)
        self.mode = mode
        self.if_rate = info["if_rate"]
        self.audio_rate = float(audio_rate)
        bw = bandwidth if bandwidth is not None else info["bandwidth"]
        self.bandwidth = bw

        self.nb = NoiseBlanker() if noise_blanker else None
        self.squelch = PowerSquelch(squelch_db) if squelch_db is not None else None
        self.fmnr = FmIfNoiseReduction(32) if fm_if_nr else None
        # CTCSS gate on the demodulated audio ahead of the AF resampler —
        # the reference afChain order (radio_module.h:98-110)
        if ctcss_tone is not None:
            from ..kernels.ctcss import CtcssSquelch

            self.ctcss = CtcssSquelch(self.if_rate, required_tone=ctcss_tone)
        else:
            self.ctcss = None

        if mode == "wfm":
            # pilot_mode: "normalized" (analytic pilot, best SNR vs the
            # oracle) by default for interactive use; "envelope" is the
            # throughput-optimized exact-algebra variant the flagship
            # pipeline ships (kernels/wfm.py)
            # mpx_eq on: the radio's IF is always DDC-fed, so the
            # discriminator's sinc droop is always present (see
            # taps.inverse_sinc; improves stereo separation ~34 -> 55+ dB
            # and RDS subcarrier flatness vs the reference's
            # uncompensated chain).
            self.demod = BroadcastFm(
                deviation=bw / 2.0,
                samplerate=self.if_rate,
                stereo=stereo,
                rds_out=rds,
                pilot_mode=pilot_mode,
                mpx_eq=True,
            )
        elif mode == "nfm":
            self.demod = Fm(self.if_rate, bw)
        elif mode == "am":
            self.demod = Am(self.if_rate, bw)
        elif mode in ("usb", "lsb", "dsb"):
            self.demod = Ssb(self.if_rate, bw, mode=mode)
        elif mode == "cw":
            self.demod = Cw(self.if_rate)
        elif mode == "raw":
            self.demod = None
        else:
            raise ValueError(f"unknown mode {mode}")

        self.resamp = RationalResampler(self.if_rate, audio_rate)
        self.hpf = (
            Fir(tapsmod.high_pass(300.0, 100.0, audio_rate), dtype=jnp.float32)
            if high_pass
            else None
        )
        if deemphasis == "default":
            deemphasis = info["deemp"]
        self.deemph = Deemphasis(deemphasis, audio_rate) if deemphasis else None

    @staticmethod
    def ctcss_tone_detected(state) -> int | None:
        """Host-side read of the decoded CTCSS tone index from a chain
        state pytree (None when no CTCSS gate is configured)."""
        st = state.get("ctcss") if isinstance(state, dict) else None
        if not st:
            return None
        return int(np.asarray(st["tone"]))

    def block_multiple(self) -> int:
        m = self.resamp.block_multiple()
        if self.ctcss is not None:
            m = int(np.lcm(m, self.ctcss.block_multiple()))
        return m

    def init_state(self):
        return {
            "nb": self.nb.init_state() if self.nb else (),
            "sq": self.squelch.init_state() if self.squelch else (),
            "fmnr": self.fmnr.init_state() if self.fmnr else (),
            "ctcss": self.ctcss.init_state() if self.ctcss else (),
            "demod": self.demod.init_state() if self.demod else (),
            "resamp": self.resamp.init_state(),
            "hpf": self.hpf.init_state() if self.hpf else (),
            "deemph": self.deemph.init_state() if self.deemph else (),
        }

    def out_len(self, n: int) -> int:
        return self.resamp.out_len(n)

    def __call__(self, state, x):
        st = dict(state)
        if self.nb:
            st["nb"], x = self.nb(state["nb"], x)
        if self.squelch:
            st["sq"], x = self.squelch(state["sq"], x)
        if self.fmnr:
            st["fmnr"], x = self.fmnr(state["fmnr"], x)

        if self.mode == "wfm":
            st["demod"], (audio, _rds) = self.demod(state["demod"], x)  # (2, n)
        elif self.mode == "raw":
            audio = jnp.stack([x.real, x.imag])
        else:
            st["demod"], mono = self.demod(state["demod"], x)
            audio = jnp.stack([mono, mono])

        if self.ctcss:
            st["ctcss"], (audio, _tone) = self.ctcss(state["ctcss"], audio)
        st["resamp"], a = self.resamp(state["resamp"], audio.astype(jnp.complex64))
        a = a.real
        if self.hpf:
            st["hpf"], a = self.hpf(state["hpf"], a)
        if self.deemph:
            st["deemph"], a = self.deemph(state["deemph"], a)
        return st, a
