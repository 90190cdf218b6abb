"""NFM / AM / SSB / CW demodulator end-to-end tests on synthetic signals."""

import numpy as np
import jax.numpy as jnp

from sdrtpu.kernels.analog import Am, Cw, Fm, Ssb


def tone_freq(y, fs, skip=2000):
    y = y[skip:]
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    spec[0:3] = 0  # ignore DC
    return np.fft.rfftfreq(len(y), 1 / fs)[np.argmax(spec)]


def test_nfm_tone():
    fs, bw, f_mod = 50000.0, 12500.0, 1000.0
    n = np.arange(1 << 16)
    msg = np.sin(2 * np.pi * f_mod * n / fs)
    phase = np.cumsum(2 * np.pi * (bw / 2) * msg / fs)
    iq = np.exp(1j * phase).astype(np.complex64)
    d = Fm(fs, bw)
    st, y = d(d.init_state(), jnp.asarray(iq))
    y = np.asarray(y)
    assert abs(tone_freq(y, fs) - f_mod) < 10
    assert abs(np.max(np.abs(y[5000:])) - 1.0) < 0.05


def test_am_tone():
    fs, bw, f_mod = 15000.0, 10000.0, 1000.0
    n = np.arange(1 << 16)
    msg = np.sin(2 * np.pi * f_mod * n / fs)
    iq = ((1.0 + 0.5 * msg) * 0.3).astype(np.complex64)
    d = Am(fs, bw)
    st, y = d(d.init_state(), jnp.asarray(iq))
    y = np.asarray(y)
    assert abs(tone_freq(y, fs, skip=20000) - f_mod) < 10


def test_usb_tone():
    # USB: audio tone f appears at +f within [0, bw] after +bw/2 shift of
    # the IQ centered at -bw/2..  Signal: exp(j*2pi*(f - bw/2)*t) centered.
    fs, bw, f_mod = 24000.0, 3000.0, 700.0
    n = np.arange(1 << 16)
    iq = np.exp(2j * np.pi * (f_mod - bw / 2) * n / fs).astype(np.complex64)
    d = Ssb(fs, bw, mode="usb")
    st, y = d(d.init_state(), jnp.asarray(iq))
    y = np.asarray(y)
    assert abs(tone_freq(y, fs, skip=20000) - f_mod) < 10


def test_lsb_tone():
    fs, bw, f_mod = 24000.0, 3000.0, 900.0
    n = np.arange(1 << 16)
    iq = np.exp(-2j * np.pi * (f_mod - bw / 2) * n / fs).astype(np.complex64)
    d = Ssb(fs, bw, mode="lsb")
    st, y = d(d.init_state(), jnp.asarray(iq))
    assert abs(tone_freq(np.asarray(y), fs, skip=20000) - f_mod) < 10


def test_cw_tone():
    # Carrier at DC -> audible at the tone offset.
    fs, tone = 3000.0, 800.0
    iq = np.ones(1 << 15, np.complex64) * 0.2
    d = Cw(fs, tone=tone)
    st, y = d(d.init_state(), jnp.asarray(iq))
    assert abs(tone_freq(np.asarray(y), fs, skip=8000) - tone) < 5


def test_chunk_invariance_nfm():
    fs, bw = 50000.0, 12500.0
    rng = np.random.default_rng(5)
    iq = np.exp(1j * np.cumsum(0.2 * rng.standard_normal(1 << 14))).astype(
        np.complex64
    )
    d = Fm(fs, bw)
    st = d.init_state()
    st, full = d(st, jnp.asarray(iq))
    st = d.init_state()
    parts = []
    for i in range(0, len(iq), 2048):
        st, y = d(st, jnp.asarray(iq[i : i + 2048]))
        parts.append(np.asarray(y))
    np.testing.assert_allclose(
        np.asarray(full), np.concatenate(parts), atol=1e-4
    )
