"""WFM broadcast demodulator: mono/stereo with pilot recovery + RDS tap.

Re-expresses ``dsp::demod::BroadcastFM``
(``core/src/dsp/demod/broadcast_fm.h:144-215``) as one block-parallel
program:

    m      = quadrature_discriminate(iq)                 # MPX
    p      = bandpass_18750_19250(m)                     # pilot (complex)
    vco    = pilot tracking (see below)
    lmr    = 2 * Re( delay(m) * conj(vco)^2 )            # 38 kHz DSB decode
    L, R   = lpf(delay(m) + lmr), lpf(delay(m) - lmr)
    rds    = resample(xlate(m, -57 kHz), 5 kHz)          # optional tap

Pilot tracking modes:
- ``"envelope"``: the stereo decode only consumes ``c2 = Re(conj(vco)^2)``
  = -cos(2*theta); with a REAL pilot bandpass r = A*sin(theta) this equals
  ``r^2 / mean(r^2) - 1`` exactly (r^2 = A^2(1-cos 2theta)/2, the segment
  mean averages ~380 subcarrier cycles of the 2theta ripple away) — no
  analytic (complex) filtering, so the pilot FIR's FFTs run at HALF the
  batch via the real-packing path.  Default for the flagship pipeline.
- ``"normalized"``: vco = p/|p| — the complex-filtered pilot *is* the
  locked VCO; zero sequential work.
- ``"regression"``: per-block linear phase fit (`loops.pilot_phase_fit`) —
  an effectively zero-bandwidth PLL, best SNR.
- ``"pll"``: exact reference scan PLL (19 kHz +/-250 Hz, bw 25000/fs per
  ``broadcast_fm.h:45``) for bit-level parity testing.

Delay alignment matches the reference: both the L+R (real MPX) and L-R
(complex MPX) paths are delayed by ``(pilot_taps-1)/2 + 1`` samples
(``broadcast_fm.h:46-47``); in normalized/regression modes the +1 PLL
compensation sample is unnecessary but kept for output-comparison parity.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..graph.block import StreamOp
from . import taps as tapsmod
from .demod import Quadrature
from .fir import Fir
from .loops import NormalizedPilot, Pll, pilot_phase_fit
from .mixer import FreqXlator
from .resample import RationalResampler
from .util import Delay


def _segment_mean(r2, seg: int):
    """Per-segment mean along the last axis, broadcast back to shape.

    ``seg`` ~ 10 ms of IF samples: ~380 cycles of the 2*theta (38 kHz)
    ripple average out, while the pilot amplitude — quasi-static over
    tens of ms — is tracked per segment.  Rows not divisible by ``seg``
    fall back to a whole-row mean.
    """
    n = r2.shape[-1]
    if n % seg:
        return jnp.mean(r2, axis=-1, keepdims=True)
    shp = r2.shape[:-1] + (n // seg, seg)
    m = jnp.mean(r2.reshape(shp), axis=-1, keepdims=True)
    return jnp.broadcast_to(m, shp).reshape(r2.shape)


class BroadcastFm(StreamOp):
    """WFM demod: complex IQ at `samplerate` -> (2, n) stereo audio at IF rate.

    ``deviation`` defaults to bandwidth/2 as wired by the radio module
    (``decoder_modules/radio/src/demodulators/wfm.h:79``); the standard IF
    rate is 250 kHz (``wfm.h:268``).
    """

    def __init__(
        self,
        deviation: float = 75000.0,
        samplerate: float = 250000.0,
        stereo: bool = True,
        low_pass: bool = True,
        rds_out: bool = False,
        pilot_mode: str = "normalized",
        mpx_eq: bool = False,
        subcarrier_droop_comp: bool = False,
        channel_derotate: bool = False,
    ):
        self.samplerate = float(samplerate)
        self.stereo = stereo
        self.low_pass = low_pass
        self.rds_out = rds_out
        assert pilot_mode in ("envelope", "normalized", "regression", "pll")
        self.pilot_mode = pilot_mode
        # mpx_eq: 11-tap inverse-sinc MPX equalizer compensating the
        # discriminator's averaging droop (taps.inverse_sinc).  The
        # reference leaves the droop in (stereo separation ceiling ~34 dB
        # on DDC-fed IF); enabled by the pipeline/radio layers where the
        # IF always comes from a decimating front end, OFF here by
        # default so oracle-parity tests compare like for like.
        self.mpx_eq = bool(mpx_eq)
        if self.mpx_eq:
            self.eq_fir = Fir(
                tapsmod.inverse_sinc(11, samplerate), dtype=jnp.float32
            )
        else:
            self.eq_fir = None
        # subcarrier_droop_comp: zero-cost alternative to mpx_eq for the
        # many-channel pipeline — the discriminator droop's effect on the
        # decoded L-R is a gain [sinc((38k-f)/fs)+sinc((38k+f)/fs)]/2,
        # nearly flat over the 15 kHz audio band, so one design-time
        # minimax scalar on the lmr product recovers >=56 dB separation
        # (the 11-tap FIR measured 7.6% of 64-VFO throughput; this is a
        # fused constant multiply).  The residual is the in-band slope
        # (~0.3%) plus the channel filter's own 38 kHz droop.
        self.subcarrier_comp = np.float32(1.0)
        if subcarrier_droop_comp and stereo:
            f = np.linspace(0.0, 15000.0, 301)
            gain = 0.5 * (np.sinc((38000.0 - f) / self.samplerate)
                          + np.sinc((38000.0 + f) / self.samplerate))
            self.subcarrier_comp = np.float32(2.0 / (gain.max() + gain.min()))

        # channel_derotate: see kernels/demod.py Quadrature — lets the
        # upstream DDC skip its residual rotator (the per-channel
        # residual angle lives in quad state; pipeline seeds/retunes it)
        self.quad = Quadrature(deviation, samplerate,
                               channel_derotate=channel_derotate)
        pilot_taps = tapsmod.band_pass(
            18750.0, 19250.0, 3000.0, samplerate, odd_tap_count=True
        )
        if pilot_mode == "envelope":
            # real bandpass = 2*Re(analytic bandpass): same length, same
            # group delay.  Evaluated as banded-Toeplitz MXU matmuls
            # (method="mm"): 5.4x faster than FFT overlap-save at the
            # flagship shape (0.015 vs 0.082 ms/block, exp/demod64.py
            # round 4c).  bf16x3 passes put the contraction noise at
            # ~-95 dB — 40+ dB below the envelope mode's own 53 dB
            # algebraic parity bound, so "high" is free accuracy-wise
            # and 1.6x faster than the exact "highest".
            self.pilot_fir = Fir(
                2.0 * np.real(pilot_taps), dtype=jnp.float32,
                method="mm", mm_precision="high",
            )
        else:
            self.pilot_fir = Fir(pilot_taps, dtype=jnp.complex64)
        d = (len(pilot_taps) - 1) // 2 + 1
        # One real delay serves both branches: the reference delays the
        # discriminator output twice (real L+R path and a complex copy for
        # the L-R mix, ``broadcast_fm.h:158-171``), but the "complex" copy
        # has zero imaginary part, so Re(delayed(m) * conj(vco)^2) ==
        # delayed(m) * Re(conj(vco)^2) — the second (complex) delay line
        # is algebraically redundant.
        self.lpr_delay = Delay(d, jnp.float32)
        if pilot_mode == "pll":
            w19 = tapsmod.hz_to_rads(19000.0, samplerate)
            self.pilot_pll = Pll(
                25000.0 / samplerate,
                init_phase=0.0,
                init_freq=w19,
                min_freq=tapsmod.hz_to_rads(18750.0, samplerate),
                max_freq=tapsmod.hz_to_rads(19250.0, samplerate),
            )
        elif pilot_mode == "envelope":
            self.pilot_pll = None
        else:
            self.pilot_pll = NormalizedPilot()

        audio_taps = tapsmod.low_pass(15000.0, 4000.0, samplerate)
        self.al_fir = Fir(audio_taps, dtype=jnp.float32)
        self.ar_fir = Fir(audio_taps, dtype=jnp.float32)

        if rds_out:
            self.rds_xlator = FreqXlator(-57000.0, samplerate)
            self.rds_resamp = RationalResampler(samplerate, 5000.0)
        else:
            self.rds_xlator = None
            self.rds_resamp = None

    def init_state(self):
        return {
            "quad": self.quad.init_state(),
            "eq": self.eq_fir.init_state() if self.eq_fir else (),
            "pilot_fir": self.pilot_fir.init_state(),
            "pll": self.pilot_pll.init_state() if self.pilot_pll else (),
            "lpr_delay": self.lpr_delay.init_state(),
            "al": self.al_fir.init_state(),
            "ar": self.ar_fir.init_state(),
            "rds_xl": self.rds_xlator.init_state() if self.rds_xlator else (),
            "rds_rs": self.rds_resamp.init_state() if self.rds_resamp else (),
        }

    def out_len(self, n: int) -> int:
        return n

    def rds_len(self, n: int) -> int:
        return self.rds_resamp.out_len(n) if self.rds_resamp else 0

    def __call__(self, state, x):
        st = dict(state)
        st["quad"], m = self.quad(state["quad"], x)
        if self.eq_fir is not None:
            st["eq"], m = self.eq_fir(state["eq"], m)

        rds = None
        if not self.stereo:
            if self.rds_out:
                mc = m.astype(jnp.complex64)
                st["rds_xl"], rc = self.rds_xlator(state["rds_xl"], mc)
                st["rds_rs"], rds = self.rds_resamp(state["rds_rs"], rc)
            if self.low_pass:
                st["al"], m = self.al_fir(state["al"], m)
            out = jnp.stack([m, m])
            return st, (out, rds)

        if self.pilot_mode == "envelope":
            # c2 = Re(conj(vco)^2) computed without complex filtering:
            # r = A sin(theta) (real bandpass), r^2 = A^2 (1 - cos 2theta)/2,
            # so r^2/mean(r^2) - 1 = -cos(2 theta) = Re(conj(vco)^2) of the
            # analytic path, exactly (amplitude-normalized like p/|p|).
            st["pilot_fir"], r = self.pilot_fir(state["pilot_fir"], m)
            r2 = r * r
            seg = max(1, round(0.01 * self.samplerate))  # ~10 ms
            c2 = r2 / jnp.maximum(_segment_mean(r2, seg), 1e-12) - 1.0
        else:
            mc = m.astype(jnp.complex64)
            st["pilot_fir"], p = self.pilot_fir(state["pilot_fir"], mc)
            if self.pilot_mode == "regression":
                vco = pilot_phase_fit(p, 19000.0, self.samplerate)
            else:
                st["pll"], vco = self.pilot_pll(state["pll"], p)
            vco2 = jnp.conj(vco) * jnp.conj(vco)
            c2 = vco2.real

        st["lpr_delay"], lpr = self.lpr_delay(state["lpr_delay"], m)
        lmr = (2.0 * self.subcarrier_comp) * lpr * c2

        if self.rds_out:
            mc = m.astype(jnp.complex64)
            st["rds_xl"], rc = self.rds_xlator(state["rds_xl"], mc)
            st["rds_rs"], rds = self.rds_resamp(state["rds_rs"], rc)

        l = lpr + lmr
        r = lpr - lmr
        if self.low_pass:
            st["al"], l = self.al_fir(state["al"], l)
            st["ar"], r = self.ar_fir(state["ar"], r)
        out = jnp.stack([l, r])
        return st, (out, rds)
