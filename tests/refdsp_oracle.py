"""Literal NumPy ports of the reference's per-sample DSP chains (oracle).

This module is the independent oracle for `tests/test_oracle_parity.py`:
each class reproduces one reference block's `process()` loop sample by
sample with float32 state arithmetic, exactly as the C++ runs it.  Ports
(reference file:line for each recurrence):

- `RefFir`            ``core/src/dsp/filter/fir.h:62-83``
- `RefQuadrature`     ``core/src/dsp/demod/quadrature.h:39-46``
- `RefPll`            ``core/src/dsp/loop/pll.h:64-70`` +
                      ``phase_control_loop.h:58-66``
- `RefCostas`         ``core/src/dsp/loop/costas.h:17-46``
- `RefMeteorCostas`   ``decoder_modules/meteor_demodulator/src/meteor_costas.h``
- `RefAgc`            ``core/src/dsp/loop/agc.h:70-110``
- `RefFastAgc`        ``core/src/dsp/loop/fast_agc.h:63-82``
- `RefMM`             ``core/src/dsp/clock_recovery/mm.h:100-156``
- `RefDelay`          ``core/src/dsp/math/delay.h``
- `RefDcBlocker`      ``core/src/dsp/correction/dc_blocker.h:33-39``
- `RefDeemphasis`     ``core/src/dsp/filter/deephasis.h:58-77`` (alpha =
                      dt/(tau+dt), ``deephasis.h:93``)
- `RefXlator`         ``core/src/dsp/channel/frequency_xlator.h:43-50``
                      (exact phasor ramp instead of the VOLK incremental
                      rotator — the rotator renormalizes periodically, so
                      the exact ramp is the cleaner oracle)
- `RefBroadcastFm`    ``core/src/dsp/demod/broadcast_fm.h:144-215``
- `RefFm`/`RefAm`/`RefSsb`/`RefCw`
                      ``core/src/dsp/demod/{fm,am,ssb,cw}.h``
- `RefMeteor`         ``decoder_modules/meteor_demodulator/src/meteor_demod.h``
- `RefRdsDemod`       ``decoder_modules/radio/src/rds_demod.h:64-74``

Filter/tap design is shared with `sdrtpu.kernels.taps`, which is itself
golden-tested against the reference formulas (tests/test_taps.py) — the
oracle's job is the *per-sample chain semantics*, which is where the
TPU implementations diverge structurally (scans, block-parallel forms).

Python loops: the committed fixtures are <= a second of IQ, so the
per-sample loops run in seconds.
"""

from __future__ import annotations

import numpy as np

from sdrtpu.kernels import taps as tapsmod
from sdrtpu.kernels.clock import interp_bank

F32 = np.float32
PI = F32(np.pi)


def normalize_phase(d):
    """``math/normalize_phase.h``: single conditional wrap (not modulo)."""
    if d > PI:
        d -= F32(2.0) * PI
    elif d <= -PI:
        d += F32(2.0) * PI
    return F32(d)


def step(x):
    """``math/step.h``: sign with step(0) = -1."""
    return F32(1.0) if x > 0.0 else F32(-1.0)


def critically_damped(bandwidth):
    """``phase_control_loop.h:33-38``."""
    zeta = np.sqrt(2.0) / 2.0
    denom = 1.0 + 2.0 * zeta * bandwidth + bandwidth * bandwidth
    return F32(4 * zeta * bandwidth / denom), F32(4 * bandwidth * bandwidth / denom)


class RefPcl:
    """``PhaseControlLoop<float>`` (``phase_control_loop.h:58-94``)."""

    def __init__(self, alpha, beta, phase, min_phase, max_phase, freq,
                 min_freq, max_freq, clamp_phase=True):
        self.alpha, self.beta = F32(alpha), F32(beta)
        self.phase, self.freq = F32(phase), F32(freq)
        self.min_phase, self.max_phase = F32(min_phase), F32(max_phase)
        self.min_freq, self.max_freq = F32(min_freq), F32(max_freq)
        self.phase_delta = F32(max_phase - min_phase)
        self.clamp_phase = clamp_phase

    def advance(self, error):
        self.freq = F32(self.freq + self.beta * F32(error))
        if self.freq > self.max_freq:
            self.freq = self.max_freq
        elif self.freq < self.min_freq:
            self.freq = self.min_freq
        self.phase = F32(self.phase + self.freq + self.alpha * F32(error))
        if self.clamp_phase:
            while self.phase > self.max_phase:
                self.phase = F32(self.phase - self.phase_delta)
            while self.phase < self.min_phase:
                self.phase = F32(self.phase + self.phase_delta)


class RefFir:
    """Streaming FIR with history buffer (``fir.h:62-83``).

    out[i] = sum_t buf[i+t] * taps[t] over [history ++ x] — an unflipped
    valid correlation.  Accumulation in float64 (VOLK's SIMD accumulation
    order is unspecified; the f64 sum is within 1 ulp of any order), cast
    back to the stream dtype.
    """

    def __init__(self, taps, dtype=np.complex64):
        self.taps = np.asarray(taps, np.complex128 if np.iscomplexobj(taps)
                               else np.float64)
        self.dtype = np.dtype(dtype)
        wide = (np.complex128 if np.iscomplexobj(self.taps)
                or self.dtype.kind == "c" else np.float64)
        self.wide = wide
        self.hist = np.zeros(len(self.taps) - 1, wide)

    def process(self, x):
        buf = np.concatenate([self.hist, np.asarray(x, self.wide)])
        y = np.convolve(buf, self.taps[::-1], mode="valid")
        self.hist = buf[len(x):]
        out_dtype = (np.complex64 if self.wide == np.complex128
                     else np.float32)
        return y.astype(out_dtype)


class RefQuadrature:
    """FM discriminator (``quadrature.h:39-46``): exact atan2f phases."""

    def __init__(self, deviation_hz, samplerate):
        self.inv_dev = F32(1.0 / tapsmod.hz_to_rads(deviation_hz, samplerate))
        self.phase = F32(0.0)

    def process(self, x):
        x = np.asarray(x)
        cphase = np.arctan2(x.imag.astype(F32), x.real.astype(F32)).astype(F32)
        prev = np.concatenate([[self.phase], cphase[:-1]])
        d = cphase - prev
        d = np.where(d > PI, d - 2 * PI, d)
        d = np.where(d <= -PI, d + 2 * PI, d)
        self.phase = cphase[-1]
        return (d * self.inv_dev).astype(F32)


class RefPll:
    """Carrier PLL (``pll.h:64-70``): emits phasor(phase) then advances."""

    def __init__(self, bandwidth, init_phase=0.0, init_freq=0.0,
                 min_freq=-np.pi, max_freq=np.pi):
        a, b = critically_damped(bandwidth)
        self.pcl = RefPcl(a, b, init_phase, -np.pi, np.pi, init_freq,
                          min_freq, max_freq)

    def process(self, x):
        x = np.asarray(x)
        out = np.empty(len(x), np.complex64)
        for i in range(len(x)):
            out[i] = complex(np.cos(self.pcl.phase), np.sin(self.pcl.phase))
            err = normalize_phase(
                F32(np.arctan2(F32(x[i].imag), F32(x[i].real))) - self.pcl.phase
            )
            self.pcl.advance(err)
        return out


class RefCostas:
    """Costas loop (``costas.h:17-46``)."""

    def __init__(self, order, bandwidth, init_phase=0.0, init_freq=0.0,
                 min_freq=-np.pi, max_freq=np.pi):
        assert order in (2, 4, 8)
        self.order = order
        a, b = critically_damped(bandwidth)
        self.pcl = RefPcl(a, b, init_phase, -np.pi, np.pi, init_freq,
                          min_freq, max_freq)

    def _error(self, v):
        if self.order == 2:
            err = F32(v.real) * F32(v.imag)
        elif self.order == 4:
            err = step(v.real) * F32(v.imag) - step(v.imag) * F32(v.real)
        else:
            K = F32(np.sqrt(2.0) - 1.0)
            if abs(v.real) >= abs(v.imag):
                err = step(v.real) * F32(v.imag) - step(v.imag) * F32(v.real) * K
            else:
                err = step(v.real) * F32(v.imag) * K - step(v.imag) * F32(v.real)
        return min(max(err, F32(-1.0)), F32(1.0))

    def process(self, x):
        x = np.asarray(x)
        out = np.empty(len(x), np.complex64)
        for i in range(len(x)):
            rot = complex(np.cos(-self.pcl.phase), np.sin(-self.pcl.phase))
            v = complex(x[i]) * rot
            out[i] = v
            self.pcl.advance(self._error(v))
        return out


class RefMeteorCostas:
    """Meteor Costas (``meteor_costas.h:24-56``), broken-modulation aware."""

    PHASES = (0.47439988279190737, 2.1777839908413044,
              3.8682349942715186, -0.29067248091319986)

    def __init__(self, bandwidth, broken_modulation=False):
        a, b = critically_damped(bandwidth)
        self.pcl = RefPcl(a, b, 0.0, -np.pi, np.pi, 0.0, -np.pi, np.pi)
        self.broken = broken_modulation

    def _error(self, v):
        if self.broken:
            phase = F32(np.arctan2(F32(v.imag), F32(v.real)))
            dps = [normalize_phase(phase - F32(p)) for p in self.PHASES]
            lowest = dps[0]
            for dp in dps[1:]:
                if abs(dp) < abs(lowest):
                    lowest = dp
            err = lowest * F32(abs(v))
        else:
            err = step(v.real) * F32(v.imag) - step(v.imag) * F32(v.real)
        return min(max(F32(err), F32(-1.0)), F32(1.0))

    def process(self, x):
        x = np.asarray(x)
        out = np.empty(len(x), np.complex64)
        for i in range(len(x)):
            rot = complex(np.cos(-self.pcl.phase), np.sin(-self.pcl.phase))
            v = complex(x[i]) * rot
            out[i] = v
            self.pcl.advance(self._error(v))
        return out


class RefAgc:
    """Attack/decay AGC with clipping look-ahead (``agc.h:70-110``)."""

    def __init__(self, set_point, attack, decay, max_gain=10e6,
                 max_output_amp=10.0, init_gain=1.0):
        self.sp = F32(set_point)
        self.atk, self.dcy = F32(attack), F32(decay)
        self.inv_atk, self.inv_dcy = F32(1.0 - attack), F32(1.0 - decay)
        self.mg, self.moa = F32(max_gain), F32(max_output_amp)
        self.amp = F32(set_point / init_gain)

    def process(self, x):
        x = np.asarray(x)
        out = np.empty_like(x)
        n = len(x)
        amps = np.abs(x).astype(F32)
        for i in range(n):
            ia = amps[i]
            if ia != 0.0:
                if ia > self.amp:
                    self.amp = F32(self.amp * self.inv_atk + ia * self.atk)
                else:
                    self.amp = F32(self.amp * self.inv_dcy + ia * self.dcy)
                gain = min(F32(self.sp / self.amp), self.mg)
            else:
                gain = F32(1.0)
            if ia * gain > self.moa:
                self.amp = amps[i:].max()
                gain = min(F32(self.sp / self.amp), self.mg)
            out[i] = x[i] * gain
        return out


class RefFastAgc:
    """Multiplicative AGC (``fast_agc.h:63-82``)."""

    def __init__(self, set_point, max_gain, rate, init_gain=1.0):
        self.sp, self.mg, self.rate = F32(set_point), F32(max_gain), F32(rate)
        self.gain = F32(init_gain)

    def process(self, x):
        x = np.asarray(x)
        out = np.empty_like(x)
        for i in range(len(x)):
            out[i] = x[i] * self.gain
            amp = F32(abs(out[i]))
            self.gain = F32(self.gain + (self.sp - amp) * self.rate)
            if self.gain > self.mg:
                self.gain = self.mg
        return out


class RefMM:
    """Mueller & Muller clock recovery (``mm.h:100-156``).

    The interpolator bank comes from the same generator as the TPU kernel
    (``mm.h:161-166`` formulas, golden-tested in tests/test_taps.py).
    """

    def __init__(self, omega, omega_gain, mu_gain, omega_rel_limit,
                 interp_phase_count=128, interp_tap_count=8,
                 complex_mode=True):
        self.P, self.T = interp_phase_count, interp_tap_count
        self.bank = interp_bank(self.P, self.T).astype(F32)
        self.pcl = RefPcl(mu_gain, omega_gain, 0.0, 0.0, 1.0, omega,
                          omega * (1.0 - omega_rel_limit),
                          omega * (1.0 + omega_rel_limit), clamp_phase=False)
        self.complex_mode = complex_mode
        dtype = np.complex64 if complex_mode else np.float32
        self.hist = np.zeros(self.T - 1, dtype)
        self.offset = 0
        self.last_out = F32(0.0)
        self.p0 = self.p1 = self.p2 = np.complex64(0)
        self.c0 = self.c1 = self.c2 = np.complex64(0)

    @staticmethod
    def _cstep(v):
        return np.complex64(complex(step(v.real), step(v.imag)))

    def process(self, x):
        x = np.asarray(x)
        n = len(x)
        buf = np.concatenate([self.hist, x])
        out = []
        while self.offset < n:
            ph = int(np.floor(self.pcl.phase * F32(self.P)))
            ph = min(max(ph, 0), self.P - 1)
            window = buf[self.offset: self.offset + self.T]
            val = np.dot(window.astype(np.complex128 if self.complex_mode
                                       else np.float64),
                         self.bank[ph].astype(np.float64))
            val = (np.complex64 if self.complex_mode else F32)(val)
            out.append(val)
            if self.complex_mode:
                self.p2, self.p1 = self.p1, self.p0
                self.c2, self.c1 = self.c1, self.c0
                self.p0, self.c0 = val, self._cstep(val)
                err = F32((((self.p0 - self.p2) * np.conj(self.c1))
                           - ((self.c0 - self.c2) * np.conj(self.p1))).real)
            else:
                err = step(self.last_out) * val - self.last_out * step(val)
                self.last_out = val
            err = min(max(F32(err), F32(-1.0)), F32(1.0))
            self.pcl.advance(err)
            delta = F32(np.floor(self.pcl.phase))
            self.offset += int(delta)
            self.pcl.phase = F32(self.pcl.phase - delta)
        self.offset -= n
        self.hist = buf[n:]
        return np.asarray(out, np.complex64 if self.complex_mode else F32)


class RefDelay:
    """Pure delay (``math/delay.h``)."""

    def __init__(self, d, dtype=np.float32):
        self.buf = np.zeros(d, dtype)

    def process(self, x):
        x = np.asarray(x, self.buf.dtype)
        ext = np.concatenate([self.buf, x])
        self.buf = ext[len(x):]
        return ext[: len(x)]


class RefDcBlocker:
    """1-pole DC tracker (``dc_blocker.h:33-39``)."""

    def __init__(self, rate):
        self.rate = F32(rate)
        self.offset = F32(0.0)

    def process(self, x):
        out = np.empty(len(x), F32)
        for i in range(len(x)):
            out[i] = F32(x[i]) - self.offset
            self.offset = F32(self.offset + out[i] * self.rate)
        return out


class RefDeemphasis:
    """1-pole deemphasis (``deephasis.h:58-77``, alpha = dt/(tau+dt))."""

    def __init__(self, tau, samplerate):
        dt = 1.0 / samplerate
        self.alpha = F32(dt / (tau + dt))
        self.last = F32(0.0)

    def process(self, x):
        out = np.empty(len(x), F32)
        prev = self.last
        for i in range(len(x)):
            prev = F32(self.alpha * F32(x[i]) + (F32(1.0) - self.alpha) * prev)
            out[i] = prev
        self.last = prev
        return out


class RefXlator:
    """Frequency translation (``frequency_xlator.h:43-50``), exact ramp."""

    def __init__(self, offset_hz, samplerate):
        self.omega = 2.0 * np.pi * offset_hz / samplerate
        self.n = 0

    def process(self, x):
        idx = self.n + np.arange(len(x), dtype=np.float64)
        rot = np.exp(1j * np.mod(self.omega * idx, 2.0 * np.pi))
        self.n += len(x)
        return (np.asarray(x, np.complex128) * rot).astype(np.complex64)


class RefBroadcastFm:
    """WFM stereo demod (``broadcast_fm.h:144-215``), stereo path.

    Returns (l, r) float32 at the IF rate; optional 57 kHz complex RDS tap
    BEFORE resampling (the reference resamples to 5 ksps with its
    RationalResampler; parity tests resample with sdrtpu's and compare
    chains from the common 5 ksps point).
    """

    def __init__(self, deviation, samplerate, low_pass=True, rds_out=False):
        self.quad = RefQuadrature(deviation, samplerate)
        pilot_taps = tapsmod.band_pass(18750.0, 19250.0, 3000.0, samplerate,
                                       odd_tap_count=True)
        self.pilot_fir = RefFir(pilot_taps, np.complex64)
        d = (len(pilot_taps) - 1) // 2 + 1
        self.pilot_pll = RefPll(
            25000.0 / samplerate, 0.0,
            tapsmod.hz_to_rads(19000.0, samplerate),
            tapsmod.hz_to_rads(18750.0, samplerate),
            tapsmod.hz_to_rads(19250.0, samplerate),
        )
        self.lpr_delay = RefDelay(d, np.float32)
        self.lmr_delay = RefDelay(d, np.complex64)
        audio_taps = tapsmod.low_pass(15000.0, 4000.0, samplerate)
        self.al_fir = RefFir(audio_taps, np.float32)
        self.ar_fir = RefFir(audio_taps, np.float32)
        self.low_pass = low_pass
        self.rds_out = rds_out
        if rds_out:
            self.rds_xlator = RefXlator(-57000.0, samplerate)

    def process(self, x):
        m = self.quad.process(x)                      # MPX (float)
        mc = m.astype(np.complex64)                   # rtoc
        p = self.pilot_fir.process(mc)
        vco = self.pilot_pll.process(p)
        lpr = self.lpr_delay.process(m)
        lmrd = self.lmr_delay.process(mc)
        vco_c = np.conj(vco)
        lmr_c = lmrd * vco_c * vco_c
        rds = self.rds_xlator.process(mc) if self.rds_out else None
        lmr = 2.0 * lmr_c.real.astype(F32)
        l = lpr + lmr
        r = lpr - lmr
        if self.low_pass:
            l = self.al_fir.process(l)
            r = self.ar_fir.process(r)
        return l.astype(F32), r.astype(F32), rds


class RefFm:
    """NFM demod (``fm.h``): quadrature + audio lowpass."""

    def __init__(self, samplerate, bandwidth, low_pass=True):
        self.quad = RefQuadrature(bandwidth / 2.0, samplerate)
        self.low_pass = low_pass
        if low_pass:
            self.lpf = RefFir(
                tapsmod.low_pass(bandwidth / 2.0, bandwidth * 0.05, samplerate),
                np.float32,
            )

    def process(self, x):
        m = self.quad.process(x)
        return self.lpf.process(m) if self.low_pass else m


class RefAm:
    """AM demod (``am.h:86-115``), audio-AGC mode as the radio wires it."""

    def __init__(self, samplerate, bandwidth, agc_mode="audio",
                 agc_attack=50.0, agc_decay=5.0, dc_block_rate=None):
        rate = (dc_block_rate if dc_block_rate is not None
                else 50.0 / samplerate)
        self.agc_mode = agc_mode
        kw = dict(max_gain=10e6, max_output_amp=10.0, init_gain=np.inf)
        self.carrier_agc = RefAgc(1.0, agc_attack / samplerate,
                                  agc_decay / samplerate, **kw)
        self.audio_agc = RefAgc(1.0, agc_attack / samplerate,
                                agc_decay / samplerate, **kw)
        self.dc = RefDcBlocker(rate)
        self.lpf = RefFir(
            tapsmod.low_pass(bandwidth / 2.0, (bandwidth / 2.0) * 0.1,
                             samplerate),
            np.float32,
        )

    def process(self, x):
        x = np.asarray(x, np.complex64)
        if self.agc_mode == "carrier":
            x = self.carrier_agc.process(x)
        y = np.abs(x).astype(F32)
        y = self.dc.process(y)
        if self.agc_mode == "audio":
            y = self.audio_agc.process(y)
        return self.lpf.process(y)


class RefSsb:
    """SSB demod (``ssb.h:63-77``)."""

    def __init__(self, samplerate, bandwidth, mode="usb",
                 agc_attack=50.0, agc_decay=5.0):
        translation = {"usb": bandwidth / 2.0, "lsb": -bandwidth / 2.0,
                       "dsb": 0.0}[mode]
        self.xl = RefXlator(translation, samplerate)
        self.agc = RefAgc(1.0, agc_attack / samplerate,
                          agc_decay / samplerate, 10e6, 10.0, np.inf)

    def process(self, x):
        y = self.xl.process(x).real.astype(F32)
        return self.agc.process(y).astype(F32)


class RefCw:
    """CW demod (``cw.h``)."""

    def __init__(self, samplerate, tone=800.0, agc_attack=50.0,
                 agc_decay=5.0):
        self.xl = RefXlator(tone, samplerate)
        self.agc = RefAgc(1.0, agc_attack / samplerate,
                          agc_decay / samplerate, 10e6, 10.0, np.inf)

    def process(self, x):
        y = self.xl.process(x).real.astype(F32)
        return self.agc.process(y).astype(F32)


class RefMeteor:
    """Meteor LRPT demod (``meteor_demod.h:process``): RRC -> FastAGC ->
    MeteorCostas -> [OQPSK delay] -> MM(complex)."""

    def __init__(self, symbolrate, samplerate, rrc_tap_count=33,
                 rrc_beta=0.6, agc_rate=0.001, costas_bw=0.01,
                 broken_modulation=False, oqpsk=False,
                 omega_gain=0.01 ** 2 / 4.0, mu_gain=0.01,
                 omega_rel_limit=0.01):
        rrc = tapsmod.root_raised_cosine_rate(rrc_tap_count, rrc_beta,
                                              symbolrate, samplerate)
        self.rrc = RefFir(rrc, np.complex64)
        self.agc = RefFastAgc(1.0, 10e6, agc_rate)
        self.costas = RefMeteorCostas(costas_bw, broken_modulation)
        self.oqpsk = oqpsk
        self.last_i = F32(0.0)
        self.mm = RefMM(samplerate / symbolrate, omega_gain, mu_gain,
                        omega_rel_limit, complex_mode=True)

    def process(self, x):
        y = self.rrc.process(np.asarray(x, np.complex64))
        y = self.agc.process(y)
        y = self.costas.process(y)
        if self.oqpsk:
            out = np.empty_like(y)
            for i in range(len(y)):
                tmp = F32(y[i].imag)
                out[i] = complex(F32(y[i].real), self.last_i)
                self.last_i = tmp
            y = out
        return self.mm.process(y)


class RefRdsDemod:
    """RDS bit recovery at 5 ksps (``rds_demod.h:64-74``)."""

    def __init__(self):
        self.agc = RefFastAgc(1.0, 1e6, 0.1)
        self.costas = RefCostas(2, 0.005)
        self.fir = RefFir(
            tapsmod.band_pass(0.0 + 1e-9, 2375.0, 100.0, 5000.0),
            np.complex64,
        )
        baud_w = tapsmod.hz_to_rads(2375.0 / 2.0, 5000.0)
        self.costas2 = RefCostas(2, 0.01, 0.0, baud_w,
                                 baud_w - baud_w * 0.1, baud_w + baud_w * 0.1)
        self.mm = RefMM(5000.0 / (2375.0 / 2.0), 1e-6, 0.01, 0.01,
                        complex_mode=False)
        self.last = np.uint8(0)

    def process(self, x):
        y = self.agc.process(np.asarray(x, np.complex64))
        y = self.costas.process(y)
        y = self.fir.process(y)
        y = self.costas2.process(y)
        soft = y.real.astype(F32)
        sym = self.mm.process(soft)
        hard = (sym > 0.0).astype(np.uint8)
        out = np.empty_like(hard)
        for i in range(len(hard)):
            out[i] = (int(hard[i]) - int(self.last) + 2) % 2
            self.last = hard[i]
        return out, sym


class RefPowerSquelch:
    """Block squelch (``noise_reduction/power_squelch.h:33-50``)."""

    def __init__(self, level_db):
        self.level = F32(level_db)

    def process(self, x):
        x = np.asarray(x)
        mean = F32(np.abs(x).astype(F32).sum() / F32(len(x)))
        if F32(10.0) * F32(np.log10(max(mean, 1e-30))) >= self.level:
            return x.copy()
        return np.zeros_like(x)


class RefNoiseBlanker:
    """Impulse blanker (``noise_reduction/noise_blanker.h:38-57``)."""

    def __init__(self, rate, level):
        self.rate = F32(rate)
        self.inv_rate = F32(1.0 - rate)
        self.level = F32(level)
        self.amp = F32(1.0)

    def process(self, x):
        x = np.asarray(x)
        out = np.empty_like(x)
        for i in range(len(x)):
            in_amp = F32(abs(x[i]))
            gain = F32(1.0)
            if in_amp != 0.0:
                self.amp = F32(self.amp * self.inv_rate + in_amp * self.rate)
                excess = F32(in_amp / self.amp)
                if excess > self.level:
                    gain = F32(1.0 / excess)
            out[i] = x[i] * gain
        return out
