"""FM IF noise reduction vs a sequential golden port of fm_if.h."""

import numpy as np
import jax.numpy as jnp

from sdrtpu.kernels.fmnr import FmIfNoiseReduction
from sdrtpu.kernels.windows import periodic_window


def golden_fmif(x, bins):
    """Direct port of the reference per-sample FFT loop (float64)."""
    w = periodic_window("nuttall", bins)
    buf = np.concatenate([np.zeros(bins - 1, np.complex128), x])
    out = np.empty(len(x), np.complex128)
    for i in range(len(x)):
        fft_in = buf[i : i + bins] * w
        X = np.fft.fft(fft_in)
        k = np.argmax(np.abs(X))
        back = np.zeros(bins, np.complex128)
        back[k] = X[k]
        y = np.fft.ifft(back)
        out[i] = y[bins // 2]
    return out


def test_matches_golden():
    rng = np.random.default_rng(7)
    n = 512
    t = np.arange(n)
    x = (
        np.exp(2j * np.pi * 0.07 * t)
        + 0.1 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    ).astype(np.complex64)
    op = FmIfNoiseReduction(32)
    st, y = op(op.init_state(), jnp.asarray(x))
    ref = golden_fmif(x.astype(np.complex128), 32)
    np.testing.assert_allclose(np.asarray(y), ref, atol=2e-3)


def test_denoises_tone():
    rng = np.random.default_rng(8)
    n = 4096
    t = np.arange(n)
    clean = np.exp(2j * np.pi * 0.1 * t)
    noise = 0.3 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    x = (clean + noise).astype(np.complex64)
    op = FmIfNoiseReduction(32)
    st, y = op(op.init_state(), jnp.asarray(x))
    y = np.asarray(y)[100:]
    # output should correlate strongly with the clean tone
    c = clean[100:]
    corr = abs(np.vdot(y, c)) / (np.linalg.norm(y) * np.linalg.norm(c))
    in_corr = abs(np.vdot(x[100:], c)) / (np.linalg.norm(x[100:]) * np.linalg.norm(c))
    assert corr > in_corr  # NR improved correlation
    assert corr > 0.97


def test_chunk_invariance():
    rng = np.random.default_rng(9)
    x = (rng.standard_normal(1024) + 1j * rng.standard_normal(1024)).astype(
        np.complex64
    )
    op = FmIfNoiseReduction(16)
    st, full = op(op.init_state(), jnp.asarray(x))
    st = op.init_state()
    parts = []
    for i in range(0, 1024, 256):
        st, y = op(st, jnp.asarray(x[i : i + 256]))
        parts.append(np.asarray(y))
    np.testing.assert_allclose(
        np.asarray(full), np.concatenate(parts), atol=1e-5
    )
