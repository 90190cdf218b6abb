"""Quantitative demod quality floors (BASELINE "demod SNR parity").

The reference cannot be built in this environment (its fftw3/volk deps are
absent), so parity is asserted as quantitative quality floors on synthetic
captures: each demodulator must recover a known test tone with at least
the listed SINAD — values chosen at, or above, what a correct textbook
implementation of the reference chain achieves.  Regressions in any
kernel along a chain show up here as SINAD drops.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sdrtpu.kernels.analog import Am, Fm, Ssb
from sdrtpu.kernels.wfm import BroadcastFm


def sinad_db(audio: np.ndarray, f_tone: float, fs: float, skip: int = 4000) -> float:
    """Signal over (noise+distortion), tone bin ±40 Hz notched."""
    x = np.asarray(audio, np.float64)[skip:]
    x = x - x.mean()
    w = np.hanning(len(x))
    spec = np.abs(np.fft.rfft(x * w)) ** 2
    freqs = np.fft.rfftfreq(len(x), 1 / fs)
    tone = (freqs > f_tone - 40) & (freqs < f_tone + 40)
    band = freqs < min(fs / 2, 15000.0)
    sig = spec[tone].sum()
    rest = spec[band & ~tone & (freqs > 40)].sum()
    return 10 * np.log10(sig / max(rest, 1e-30))


def test_wfm_stereo_sinad():
    fs = 250000.0
    n = 1 << 18
    t = np.arange(n) / fs
    L = R = 0.8 * np.sin(2 * np.pi * 1000.0 * t)
    mpx = 0.45 * (L + R) + 0.1 * np.sin(2 * np.pi * 19000.0 * t)
    iq = np.exp(1j * np.cumsum(2 * np.pi * 75000.0 * mpx / fs)).astype(np.complex64)
    d = BroadcastFm(samplerate=fs, stereo=True, pilot_mode="normalized")
    _, (out, _) = d(d.init_state(), jnp.asarray(iq))
    s = sinad_db(np.asarray(out)[0], 1000.0, fs)
    assert s > 45.0, f"WFM stereo SINAD {s:.1f} dB"


def test_nfm_sinad():
    fs, bw = 50000.0, 12500.0
    n = 1 << 17
    t = np.arange(n) / fs
    msg = 0.8 * np.sin(2 * np.pi * 1000.0 * t)
    iq = np.exp(1j * np.cumsum(2 * np.pi * (bw / 2) * msg / fs)).astype(np.complex64)
    d = Fm(fs, bw)
    _, y = d(d.init_state(), jnp.asarray(iq))
    s = sinad_db(np.asarray(y), 1000.0, fs)
    assert s > 40.0, f"NFM SINAD {s:.1f} dB"


def test_am_sinad():
    fs, bw = 15000.0, 10000.0
    n = 1 << 17
    t = np.arange(n) / fs
    iq = ((1.0 + 0.6 * np.sin(2 * np.pi * 1000.0 * t)) * 0.4).astype(np.complex64)
    d = Am(fs, bw)
    _, y = d(d.init_state(), jnp.asarray(iq))
    s = sinad_db(np.asarray(y), 1000.0, fs, skip=30000)
    assert s > 35.0, f"AM SINAD {s:.1f} dB"


def test_usb_sinad():
    fs, bw = 24000.0, 3000.0
    n = 1 << 17
    t = np.arange(n) / fs
    iq = np.exp(2j * np.pi * (700.0 - bw / 2) * t).astype(np.complex64)
    d = Ssb(fs, bw, mode="usb")
    _, y = d(d.init_state(), jnp.asarray(iq))
    s = sinad_db(np.asarray(y), 700.0, fs, skip=30000)
    assert s > 35.0, f"USB SINAD {s:.1f} dB"


def test_wfm_stereo_separation_floor():
    fs = 250000.0
    n = 1 << 18
    t = np.arange(n) / fs
    L = 0.8 * np.sin(2 * np.pi * 1000.0 * t)
    R = 0.8 * np.sin(2 * np.pi * 2500.0 * t)
    mpx = (0.45 * (L + R) + 0.1 * np.sin(2 * np.pi * 19000.0 * t)
           + 0.45 * (L - R) * np.sin(2 * np.pi * 38000.0 * t))
    iq = np.exp(1j * np.cumsum(2 * np.pi * 75000.0 * mpx / fs)).astype(np.complex64)
    for mode in ("normalized", "regression"):
        d = BroadcastFm(samplerate=fs, stereo=True, pilot_mode=mode)
        _, (out, _) = d(d.init_state(), jnp.asarray(iq))
        out = np.asarray(out)[:, 20000:]

        def tone_power(x, f):
            spec = np.abs(np.fft.rfft(x * np.hanning(len(x)))) ** 2
            fr = np.fft.rfftfreq(len(x), 1 / fs)
            return spec[(fr > f - 100) & (fr < f + 100)].sum()

        sep = 10 * np.log10(tone_power(out[0], 1000) / tone_power(out[0], 2500))
        assert sep > 40.0, f"{mode}: separation {sep:.1f} dB"
