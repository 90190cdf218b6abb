"""WFM broadcast demod end-to-end: stereo separation on a synthetic MPX."""

import numpy as np
import jax.numpy as jnp
import pytest

from sdrtpu.kernels.wfm import BroadcastFm


def make_stereo_fm(fs=250000.0, dev=75000.0, n=1 << 17, fl=1000.0, fr=2500.0):
    """Synthesize an FM-modulated stereo MPX: L = tone fl, R = tone fr."""
    t = np.arange(n) / fs
    L = np.sin(2 * np.pi * fl * t)
    R = np.sin(2 * np.pi * fr * t)
    pilot = 0.1 * np.sin(2 * np.pi * 19000.0 * t)
    sub = 0.5 * (L - R) * np.sin(2 * np.pi * 38000.0 * t)
    mpx = 0.45 * (L + R) + pilot + 0.9 * sub
    phase = np.cumsum(2 * np.pi * dev * mpx / fs)
    return np.exp(1j * phase).astype(np.complex64), L, R


def tone_power(x, f, fs):
    n = len(x)
    w = np.hanning(n)
    spec = np.abs(np.fft.rfft(x * w)) ** 2
    freqs = np.fft.rfftfreq(n, 1 / fs)
    band = (freqs > f - 100) & (freqs < f + 100)
    return spec[band].sum()


@pytest.mark.parametrize("pilot_mode", ["normalized", "regression", "envelope"])
def test_stereo_separation(pilot_mode):
    fs = 250000.0
    iq, L, R = make_stereo_fm(fs=fs)
    d = BroadcastFm(samplerate=fs, stereo=True, pilot_mode=pilot_mode)
    st = d.init_state()
    st, (out, _) = d(st, jnp.asarray(iq))
    out = np.asarray(out)[:, 20000:]  # drop transient
    l_ch, r_ch = out[0], out[1]
    # Left channel: 1 kHz strong, 2.5 kHz suppressed; vice versa for right.
    sep_l = 10 * np.log10(tone_power(l_ch, 1000, fs) / tone_power(l_ch, 2500, fs))
    sep_r = 10 * np.log10(tone_power(r_ch, 2500, fs) / tone_power(r_ch, 1000, fs))
    assert sep_l > 20.0, f"L separation {sep_l:.1f} dB"
    assert sep_r > 20.0, f"R separation {sep_r:.1f} dB"


def test_mono_path():
    fs = 250000.0
    iq, L, R = make_stereo_fm(fs=fs)
    d = BroadcastFm(samplerate=fs, stereo=False)
    st = d.init_state()
    st, (out, _) = d(st, jnp.asarray(iq))
    out = np.asarray(out)
    assert out.shape[0] == 2
    np.testing.assert_allclose(out[0], out[1])  # mono duplicated
    # Mono contains both tones (L+R)
    m = out[0][20000:]
    assert tone_power(m, 1000, fs) > 100
    assert tone_power(m, 2500, fs) > 100


def test_chunked_equals_full_normalized():
    fs = 250000.0
    iq, _, _ = make_stereo_fm(fs=fs, n=1 << 15)
    d = BroadcastFm(samplerate=fs, stereo=True, pilot_mode="normalized")
    st = d.init_state()
    st, (full, _) = d(st, jnp.asarray(iq))
    st = d.init_state()
    parts = []
    for i in range(0, len(iq), 4096):
        st, (y, _) = d(st, jnp.asarray(iq[i : i + 4096]))
        parts.append(np.asarray(y))
    chunked = np.concatenate(parts, axis=-1)
    np.testing.assert_allclose(np.asarray(full), chunked, atol=1e-3)


def test_inverse_sinc_taps_flatten_droop():
    """taps.inverse_sinc compensates 1/sinc(f/fs) to <0.1% over 0-60 kHz."""
    from sdrtpu.kernels import taps as tapsmod

    fs = 250000.0
    h = tapsmod.inverse_sinc(11, fs)
    f = np.array([1000.0, 15000.0, 19000.0, 38000.0, 53000.0, 57000.0])
    k = np.arange(len(h))
    H = np.abs(np.exp(-2j * np.pi * np.outer(f / fs, k)) @ h.astype(np.float64))
    residual = H * np.sinc(f / fs) - 1.0
    assert np.max(np.abs(residual)) < 1e-3, residual


def test_mpx_eq_lifts_decimated_separation():
    """The DDC discriminator's sinc droop caps separation at ~34 dB;
    mpx_eq removes it (round 5; the reference ships the droop,
    ``quadrature.h:39-46``)."""
    fs_wide, fsif = 2_000_000.0, 250000.0
    n = 1 << 21
    t = np.arange(n) / fs_wide
    L = 0.8 * np.sin(2 * np.pi * 1000.0 * t)
    R = 0.8 * np.sin(2 * np.pi * 2500.0 * t)
    mpx = (0.225 * (L + R) + 0.1 * np.sin(2 * np.pi * 19000.0 * t)
           + 0.225 * (L - R) * np.sin(2 * np.pi * 38000.0 * t))
    iq = np.exp(1j * np.cumsum(2 * np.pi * 75000.0 * mpx / fs_wide)
                ).astype(np.complex64)
    from sdrtpu.shard.channelizer import Channelizer

    chz = Channelizer(np.array([0.0]), fs_wide, fsif, n)
    _, yif = chz(chz.init_state(), jnp.asarray(iq))
    yif = np.asarray(yif)[0]
    seps = {}
    for eq in (False, True):
        d = BroadcastFm(samplerate=fsif, stereo=True, low_pass=True,
                        pilot_mode="envelope", mpx_eq=eq)
        _, (out, _) = d(d.init_state(), jnp.asarray(yif))
        x = np.asarray(out)[0, 40000:]
        seps[eq] = 10 * np.log10(tone_power(x, 1000, fsif)
                                 / tone_power(x, 2500, fsif))
    assert seps[False] < 40.0, seps   # the uncompensated ceiling is real
    assert seps[True] > 55.0, seps    # and the equalizer removes it
