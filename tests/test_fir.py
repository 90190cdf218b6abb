"""Streaming FIR / decimator kernels vs NumPy golden references."""

import numpy as np
import jax.numpy as jnp

from sdrtpu.kernels import taps
from sdrtpu.kernels.fir import DecimatingFir, Fir, MultistageDecimator

RNG = np.random.default_rng(42)


def run_stream(op, x, chunk):
    state = op.init_state()
    outs = []
    for i in range(0, len(x), chunk):
        state, y = op(state, jnp.asarray(x[i : i + chunk]))
        outs.append(np.asarray(y))
    return np.concatenate(outs)


def golden_fir(x, h):
    """Reference semantics: out[i] = sum_t x_hist[i-(T-1)+t] * h[t]."""
    ext = np.concatenate([np.zeros(len(h) - 1, x.dtype), x])
    return np.array(
        [np.dot(ext[i : i + len(h)], h) for i in range(len(x))]
    )


class TestFir:
    def test_real_matches_golden(self):
        h = taps.low_pass(0.2, 0.1, 1.0)  # ~38 taps
        x = RNG.standard_normal(512).astype(np.float32)
        op = Fir(h, dtype=jnp.float32)
        y = run_stream(op, x, 512)
        np.testing.assert_allclose(y, golden_fir(x, h), atol=1e-4)

    def test_complex_signal_real_taps(self):
        h = taps.low_pass(0.2, 0.1, 1.0)
        x = (RNG.standard_normal(512) + 1j * RNG.standard_normal(512)).astype(
            np.complex64
        )
        op = Fir(h)
        y = run_stream(op, x, 512)
        np.testing.assert_allclose(y, golden_fir(x, h), atol=1e-4)

    def test_complex_taps(self):
        h = taps.band_pass(0.1, 0.2, 0.05, 1.0)
        x = (RNG.standard_normal(600) + 1j * RNG.standard_normal(600)).astype(
            np.complex64
        )
        op = Fir(h)
        y = run_stream(op, x, 600)
        np.testing.assert_allclose(y, golden_fir(x, h.astype(np.complex128)), atol=1e-4)

    def test_chunked_equals_full(self):
        h = taps.low_pass(0.2, 0.05, 1.0)
        x = (RNG.standard_normal(1024) + 1j * RNG.standard_normal(1024)).astype(
            np.complex64
        )
        op = Fir(h)
        y_full = run_stream(op, x, 1024)
        y_chunked = run_stream(op, x, 128)
        np.testing.assert_allclose(y_full, y_chunked, atol=1e-5)


class TestDecimatingFir:
    def test_matches_strided_golden(self):
        h = taps.half_band()
        x = (RNG.standard_normal(1024) + 1j * RNG.standard_normal(1024)).astype(
            np.complex64
        )
        op = DecimatingFir(h, 2)
        y = run_stream(op, x, 256)
        np.testing.assert_allclose(y, golden_fir(x, h)[::2], atol=1e-4)

    def test_decim4(self):
        h = taps.low_pass(0.1, 0.05, 1.0)
        x = RNG.standard_normal(1024).astype(np.float32)
        op = DecimatingFir(h, 4, dtype=jnp.float32)
        y = run_stream(op, x, 512)
        np.testing.assert_allclose(y, golden_fir(x, h)[::4], atol=1e-4)


class TestMultistageDecimator:
    def test_tone_passband_preserved(self):
        # A tone inside the final passband should survive decimation by 8.
        fs = 8.0
        n = np.arange(16384)
        x = np.exp(2j * np.pi * 0.04 * n).astype(np.complex64)  # 0.32 cycles @ fs
        op = MultistageDecimator(8)
        y = run_stream(op, x, 4096)
        assert len(y) == len(x) // 8
        # steady-state amplitude ~1
        assert abs(np.mean(np.abs(y[500:]))) > 0.95

    def test_alias_rejected(self):
        # A tone near the input Nyquist must be crushed after decim-by-8.
        n = np.arange(16384)
        x = np.exp(2j * np.pi * 0.45 * n).astype(np.complex64)
        op = MultistageDecimator(8)
        y = run_stream(op, x, 4096)
        assert np.max(np.abs(y[500:])) < 1e-3

    def test_chunk_invariance(self):
        x = (RNG.standard_normal(4096) + 1j * RNG.standard_normal(4096)).astype(
            np.complex64
        )
        op = MultistageDecimator(4)
        y1 = run_stream(op, x, 4096)
        y2 = run_stream(op, x, 512)
        np.testing.assert_allclose(y1, y2, atol=1e-5)


class TestFftFir:
    def test_fft_matches_direct_complex_taps(self):
        rng = np.random.default_rng(3)
        taps = (rng.standard_normal(316) + 1j * rng.standard_normal(316)).astype(
            np.complex64
        )
        x = (rng.standard_normal((8, 4096)) + 1j * rng.standard_normal((8, 4096))).astype(
            np.complex64
        )
        from sdrtpu.kernels.fir import Fir

        fd = Fir(taps, dtype=jnp.complex64, method="direct")
        ff = Fir(taps, dtype=jnp.complex64, method="fft")
        assert ff.method == "fft"
        sd, yd = fd(fd.init_state(), jnp.asarray(x))
        sf, yf = ff(ff.init_state(), jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(yf), np.asarray(yd), atol=2e-3)
        np.testing.assert_allclose(np.asarray(sf), np.asarray(sd), atol=1e-6)

    def test_fft_matches_direct_real(self):
        rng = np.random.default_rng(4)
        taps = rng.standard_normal(237).astype(np.float32)
        x = rng.standard_normal((2, 8, 2048)).astype(np.float32)
        from sdrtpu.kernels.fir import Fir

        fd = Fir(taps, dtype=jnp.float32, method="direct")
        ff = Fir(taps, dtype=jnp.float32, method="fft")
        sd, yd = fd(fd.init_state(), jnp.asarray(x))
        sf, yf = ff(ff.init_state(), jnp.asarray(x))
        assert yf.dtype == yd.dtype
        np.testing.assert_allclose(np.asarray(yf), np.asarray(yd), atol=2e-3)

    def test_fft_streaming_chunks_match_full(self):
        rng = np.random.default_rng(5)
        taps = (rng.standard_normal(200) + 1j * rng.standard_normal(200)).astype(
            np.complex64
        )
        x = (rng.standard_normal(8192) + 1j * rng.standard_normal(8192)).astype(
            np.complex64
        )
        from sdrtpu.kernels.fir import Fir

        f = Fir(taps, dtype=jnp.complex64, method="fft")
        st = f.init_state()
        st, full = f(st, jnp.asarray(x))
        st = f.init_state()
        parts = []
        for i in range(0, len(x), 2048):
            st, y = f(st, jnp.asarray(x[i : i + 2048]))
            parts.append(np.asarray(y))
        np.testing.assert_allclose(
            np.concatenate(parts, axis=-1), np.asarray(full), atol=3e-3
        )


class TestMatmulFir:
    """Banded-Toeplitz MXU formulation (`matmul_correlate_valid`)."""

    def test_mm_matches_direct_real(self):
        rng = np.random.default_rng(6)
        taps = rng.standard_normal(60).astype(np.float32)
        x = rng.standard_normal((2, 8, 2400)).astype(np.float32)
        from sdrtpu.kernels.fir import Fir

        fd = Fir(taps, dtype=jnp.float32, method="direct")
        fm = Fir(taps, dtype=jnp.float32, method="mm")
        sd, yd = fd(fd.init_state(), jnp.asarray(x))
        sm, ym = fm(fm.init_state(), jnp.asarray(x))
        assert ym.dtype == yd.dtype
        np.testing.assert_allclose(np.asarray(ym), np.asarray(yd), atol=2e-4)
        np.testing.assert_allclose(np.asarray(sm), np.asarray(sd), atol=1e-6)

    def test_mm_matches_direct_complex_signal_real_taps(self):
        rng = np.random.default_rng(7)
        taps = rng.standard_normal(317).astype(np.float32)
        x = (rng.standard_normal((4, 2048)) + 1j * rng.standard_normal((4, 2048))).astype(np.complex64)
        from sdrtpu.kernels.fir import Fir

        fd = Fir(taps, dtype=jnp.complex64, method="direct")
        fm = Fir(taps, dtype=jnp.complex64, method="mm")
        sd, yd = fd(fd.init_state(), jnp.asarray(x))
        sm, ym = fm(fm.init_state(), jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(ym), np.asarray(yd), atol=2e-3)

    def test_mm_matches_direct_complex_taps(self):
        rng = np.random.default_rng(8)
        taps = (rng.standard_normal(150) + 1j * rng.standard_normal(150)).astype(np.complex64)
        x = (rng.standard_normal((3, 1500)) + 1j * rng.standard_normal((3, 1500))).astype(np.complex64)
        from sdrtpu.kernels.fir import Fir

        fd = Fir(taps, dtype=jnp.complex64, method="direct")
        fm = Fir(taps, dtype=jnp.complex64, method="mm")
        sd, yd = fd(fd.init_state(), jnp.asarray(x))
        sm, ym = fm(fm.init_state(), jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(ym), np.asarray(yd), atol=5e-3)

    def test_mm_complex_taps_real_signal(self):
        rng = np.random.default_rng(9)
        taps = (rng.standard_normal(90) + 1j * rng.standard_normal(90)).astype(np.complex64)
        x = rng.standard_normal((2, 1000)).astype(np.float32)
        from sdrtpu.kernels.fir import correlate_valid, matmul_correlate_valid

        yd = correlate_valid(jnp.asarray(x), taps)
        ym = matmul_correlate_valid(jnp.asarray(x), taps)
        np.testing.assert_allclose(np.asarray(ym), np.asarray(yd), atol=2e-3)

    def test_mm_short_signal_and_odd_span(self):
        # span not a multiple of the 128 block: trim path
        rng = np.random.default_rng(10)
        taps = rng.standard_normal(33).astype(np.float32)
        x = rng.standard_normal(200).astype(np.float32)
        from sdrtpu.kernels.fir import correlate_valid, matmul_correlate_valid

        yd = correlate_valid(jnp.asarray(x), taps)
        ym = matmul_correlate_valid(jnp.asarray(x), taps)
        assert ym.shape == yd.shape
        np.testing.assert_allclose(np.asarray(ym), np.asarray(yd), atol=1e-4)
