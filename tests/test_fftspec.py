"""Spectrum analyzer framing + dB math tests."""

import numpy as np
import jax.numpy as jnp

from sdrtpu.kernels.fftspec import SpectrumAnalyzer, gen_reshape_params


def test_reshape_params_match_reference():
    # fs=8M, fft 65536 @ 20 Hz: interval = 400000 -> nz = 65536, skip = 334464
    skip, nz = gen_reshape_params(8_000_000, 65536, 20.0)
    assert nz == 65536 and skip == 400000 - 65536
    # low rate: interval smaller than fft -> zero padding
    skip, nz = gen_reshape_params(10000, 65536, 20.0)
    assert nz == 500 and skip == 0


def test_tone_peak_centered():
    fs = 1_000_000.0
    sa = SpectrumAnalyzer(fs, fft_size=1024, fft_rate=fs / 2048)  # interval 2048
    n_blocks = 4
    n = sa.interval * n_blocks
    f = 125000.0
    t = np.arange(n)
    x = np.exp(2j * np.pi * f / fs * t).astype(np.complex64)
    _, db = sa((), jnp.asarray(x))
    db = np.asarray(db)
    assert db.shape == (n_blocks, 1024)
    freqs = np.fft.fftshift(np.fft.fftfreq(1024, 1.0 / fs))
    peak_bin = np.argmax(db[-1])
    assert abs(freqs[peak_bin] - f) < fs / 1024
    # peak near 0 dB (unit tone, window loss few dB), floor well below
    assert db[-1, peak_bin] > -15.0
    assert np.median(db[-1]) < -100.0


def test_zero_pad_path():
    fs = 10000.0
    sa = SpectrumAnalyzer(fs, fft_size=1024, fft_rate=20.0)
    assert sa.nz_size == 500 and sa.skip == 0
    x = np.ones(sa.interval * 2, np.complex64)
    _, db = sa((), jnp.asarray(x))
    assert np.asarray(db).shape == (2, 1024)
