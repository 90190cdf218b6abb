"""PLL / Costas / AGC loop tests: lock behavior + exact parity vs loops."""

import numpy as np
import jax.numpy as jnp

from sdrtpu.kernels.loops import (
    Agc,
    Costas,
    NormalizedPilot,
    Pll,
    critically_damped,
    pilot_phase_fit,
)
from sdrtpu.kernels.psk import FastAgc

RNG = np.random.default_rng(11)


class TestPll:
    def test_locks_to_tone(self):
        fs = 250000.0
        f = 19000.0
        w = 2 * np.pi * f / fs
        n = np.arange(8192)
        x = np.exp(1j * (w * n + 0.7)).astype(np.complex64)
        pll = Pll(25000.0 / fs, init_freq=w, min_freq=w * 0.9, max_freq=w * 1.1)
        st, vco = pll(pll.init_state(), jnp.asarray(x))
        vco = np.asarray(vco)[4000:]
        err = np.angle(x[4000:] * np.conj(vco))
        assert np.max(np.abs(err)) < 0.02

    def test_tracks_offset_freq(self):
        fs = 250000.0
        w = 2 * np.pi * 19100.0 / fs  # 100 Hz off nominal
        n = np.arange(16384)
        x = np.exp(1j * w * n).astype(np.complex64)
        w0 = 2 * np.pi * 19000.0 / fs
        pll = Pll(25000.0 / fs, init_freq=w0, min_freq=w0 * 0.98, max_freq=w0 * 1.02)
        st, vco = pll(pll.init_state(), jnp.asarray(x))
        err = np.angle(x[8000:] * np.conj(np.asarray(vco)[8000:]))
        assert np.max(np.abs(err)) < 0.05


class TestCostas:
    def test_order2_locks_carrier(self):
        fs = 1.0
        w = 2 * np.pi * 0.01
        n = np.arange(8192)
        x = np.exp(1j * (w * n + 0.5)).astype(np.complex64)
        c = Costas(2, 0.01, min_freq=-0.5, max_freq=0.5)
        st, y = c(c.init_state(), jnp.asarray(x))
        y = np.asarray(y)[4000:]
        # locked: output collapses to the real axis (mod pi ambiguity)
        assert np.mean(np.abs(y.imag)) < 0.05

    def test_order4_locks_qpsk(self):
        # QPSK symbols at 8 samples/sym with small freq offset
        sym = (RNG.integers(0, 4, 1024) * 2 + 1) * np.pi / 4
        bb = np.repeat(np.exp(1j * sym), 8)
        w = 2 * np.pi * 0.002
        n = np.arange(len(bb))
        x = (bb * np.exp(1j * w * n)).astype(np.complex64)
        c = Costas(4, 0.02, min_freq=-0.1, max_freq=0.1)
        st, y = c(c.init_state(), jnp.asarray(x))
        y = np.asarray(y)[4096:]
        # locked QPSK: |re| and |im| both near 1/sqrt2
        assert abs(np.mean(np.abs(y.real)) - np.sqrt(0.5)) < 0.1
        assert abs(np.mean(np.abs(y.imag)) - np.sqrt(0.5)) < 0.1


class TestAgc:
    def _ref_agc(self, x, sp, atk, dcy, mg, moa, init_gain=1.0):
        amp = sp / init_gain
        out = np.empty_like(x)
        n = len(x)
        for i in range(n):
            ia = abs(x[i])
            if ia != 0.0:
                amp = amp * (1 - atk) + ia * atk if ia > amp else amp * (1 - dcy) + ia * dcy
                gain = min(sp / amp, mg)
            else:
                gain = 1.0
            if ia * gain > moa:
                amp = np.max(np.abs(x[i:]))
                gain = min(sp / amp, mg)
            out[i] = x[i] * gain
        return out

    def test_exact_parity_real(self):
        x = (RNG.standard_normal(512) * np.linspace(0.1, 3.0, 512)).astype(np.float32)
        sp, atk, dcy, mg, moa = 1.0, 50.0 / 24000, 5.0 / 24000, 1e4, 1.5
        agc = Agc(sp, atk, dcy, mg, moa)
        st, y = agc(agc.init_state(), jnp.asarray(x))
        ref = self._ref_agc(x.astype(np.float64), sp, atk, dcy, mg, moa)
        np.testing.assert_allclose(np.asarray(y), ref, atol=1e-3)

    def test_levels_complex(self):
        n = np.arange(48000)
        x = (0.01 * np.exp(2j * np.pi * 0.01 * n)).astype(np.complex64)
        agc = Agc(1.0, 50.0 / 24000, 5.0 / 24000)
        st, y = agc(agc.init_state(), jnp.asarray(x))
        assert abs(np.mean(np.abs(np.asarray(y)[-1000:])) - 1.0) < 0.05


class TestFastAgc:
    def test_matches_reference_loop(self):
        # exact parity vs the sequential fast_agc.h recurrence
        x = (0.2 * RNG.standard_normal(2000) + 0.05).astype(np.float32)
        sp, mg, rate = 1.0, 10e6, 0.1
        gain = 1.0
        ref = np.empty_like(x)
        for i, v in enumerate(x):
            ref[i] = v * gain
            gain += (sp - abs(ref[i])) * rate
            gain = min(gain, mg)
        agc = FastAgc(sp, mg, rate)
        st, y = agc(agc.init_state(), jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-2, atol=2e-2)

    def test_levels_tone(self):
        n = np.arange(32768)
        x = (0.05 * np.exp(2j * np.pi * 0.01 * n)).astype(np.complex64)
        agc = FastAgc(1.0, 10e6, 0.1)
        st, y = agc(agc.init_state(), jnp.asarray(x))
        assert abs(np.mean(np.abs(np.asarray(y)[-2000:])) - 1.0) < 0.05


class TestPilotEstimators:
    def test_normalized_pilot(self):
        n = np.arange(4096)
        p = (0.1 * np.exp(1j * (0.3 * n + 1.0))).astype(np.complex64)
        op = NormalizedPilot()
        _, vco = op((), jnp.asarray(p))
        np.testing.assert_allclose(np.abs(np.asarray(vco)), 1.0, atol=1e-5)
        np.testing.assert_allclose(
            np.angle(np.asarray(vco) * np.conj(p / np.abs(p))), 0.0, atol=1e-3
        )

    def test_phase_fit_rejects_noise(self):
        fs = 250000.0
        f = 19003.0
        n = np.arange(16384)
        clean = np.exp(2j * np.pi * f / fs * n + 0.3j)
        noisy = clean + 0.2 * (
            RNG.standard_normal(len(n)) + 1j * RNG.standard_normal(len(n))
        )
        vco = np.asarray(pilot_phase_fit(jnp.asarray(noisy, jnp.complex64), 19000.0, fs))
        err = np.angle(vco * np.conj(clean))
        assert np.max(np.abs(err)) < 0.01  # regression averages the noise away


def test_critically_damped_matches_reference_formula():
    a, b = critically_damped(0.1)
    zeta = np.sqrt(2) / 2
    denom = 1 + 2 * zeta * 0.1 + 0.01
    assert abs(a - 4 * zeta * 0.1 / denom) < 1e-12
    assert abs(b - 4 * 0.01 / denom) < 1e-12
