"""Polyphase / rational resampler vs golden sequential implementation."""

import numpy as np
import jax.numpy as jnp

from sdrtpu.kernels import taps
from sdrtpu.kernels.resample import (
    PolyphaseResampler,
    RationalResampler,
    build_polyphase_bank,
)

RNG = np.random.default_rng(3)


def golden_polyphase(x, interp, decim, h):
    """Sequential re-implementation of polyphase_resampler.h:69-99."""
    bank = build_polyphase_bank(interp, h).astype(np.float64)
    tpp = bank.shape[1]
    ext = np.concatenate([np.zeros(tpp - 1, x.dtype), x])
    out = []
    phase, offset = 0, 0
    while offset < len(x):
        out.append(np.dot(ext[offset : offset + tpp], bank[phase]))
        phase += decim
        offset += phase // interp
        phase %= interp
    return np.array(out)


def run_stream(op, x, chunk):
    state = op.init_state()
    outs = []
    for i in range(0, len(x), chunk):
        state, y = op(state, jnp.asarray(x[i : i + chunk]))
        outs.append(np.asarray(y))
    return np.concatenate(outs)


class TestPolyphase:
    def test_matches_golden_interp(self):
        h = taps.low_pass(0.2, 0.1, 1.0) * 3
        x = (RNG.standard_normal(300) + 1j * RNG.standard_normal(300)).astype(
            np.complex64
        )
        op = PolyphaseResampler(3, 2, h)
        y = run_stream(op, x, 300)
        np.testing.assert_allclose(y, golden_polyphase(x, 3, 2, h), atol=1e-4)

    def test_matches_golden_decim(self):
        h = taps.low_pass(0.1, 0.05, 1.0) * 5
        x = RNG.standard_normal(625).astype(np.float32)
        op = PolyphaseResampler(5, 25, h, dtype=jnp.float32)
        y = run_stream(op, x, 625)
        np.testing.assert_allclose(y, golden_polyphase(x, 5, 25, h), atol=1e-3)

    def test_chunk_invariance(self):
        h = taps.low_pass(0.2, 0.1, 1.0) * 24
        x = (RNG.standard_normal(1250) + 1j * RNG.standard_normal(1250)).astype(
            np.complex64
        )
        op = PolyphaseResampler(24, 125, h)
        y1 = run_stream(op, x, 1250)
        y2 = run_stream(op, x, 250)  # 250*24/125 = 48 outputs per chunk
        np.testing.assert_allclose(y1, y2, atol=1e-4)

    def test_tone_preserved(self):
        # 48/250 resample of a 1 kHz tone at 250 kHz -> still 1 kHz at 48 kHz.
        fs_in, fs_out = 250000.0, 48000.0
        op = RationalResampler(fs_in, fs_out, dtype=jnp.complex64)
        m = op.block_multiple()
        n = ((1 << 16) // m) * m
        t = np.arange(n) / fs_in
        x = np.exp(2j * np.pi * 1000.0 * t).astype(np.complex64)
        y = run_stream(op, x, n)
        spec = np.abs(np.fft.fft(y[len(y) // 2 :] * np.hanning(len(y) - len(y) // 2)))
        freqs = np.fft.fftfreq(len(spec), 1.0 / fs_out)
        peak = freqs[np.argmax(spec)]
        assert abs(peak - 1000.0) < 20.0


class TestRationalResampler:
    def test_plan_250k_to_48k(self):
        # Single-stage gcd-reduced polyphase (24/125) as one MXU matmul —
        # the planner prefers it over predecim-5 + 24/25 when the frame
        # matrix stays narrow (8x faster measured on TPU v5e).
        op = RationalResampler(250000.0, 48000.0)
        assert op.predecim is None
        assert op.interp == 24 and op.decim == 125
        assert op.resamp.method == "matmul"
        assert op.rate_error_pct < 0.01

    def test_plan_2p4m_to_250k(self):
        op = RationalResampler(2400000.0, 250000.0)
        assert op.predecim is None
        assert op.interp == 5 and op.decim == 48
        assert op.rate_error_pct < 0.01

    def test_plan_wide_ratio_keeps_predecim(self):
        # 2.4M -> 48k is a pure integer ratio: predecim only.
        op = RationalResampler(2400000.0, 48000.0)
        assert op.predecim is not None and op.predecim.ratio == 50
        assert op.resamp is None

    def test_plan_exact_integer(self):
        # 10 Msps -> 250 ksps is the pure-integer case: no polyphase stage.
        op = RationalResampler(10_000_000.0, 250000.0)
        assert op.predecim is not None and op.predecim.ratio == 40
        assert op.resamp is None

    def test_no_work_identity(self):
        op = RationalResampler(48000.0, 48000.0)
        assert op.predecim is None and op.resamp is None
        x = jnp.arange(64, dtype=jnp.complex64)
        st, y = op(op.init_state(), x)
        np.testing.assert_allclose(np.asarray(y), np.arange(64), atol=0)

    def test_out_len(self):
        op = RationalResampler(2400000.0, 250000.0)
        m = op.block_multiple()
        n = 4 * m
        assert op.out_len(n) * 2400000 // 250000 <= n + 1
