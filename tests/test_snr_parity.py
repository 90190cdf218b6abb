"""Quantitative demod quality floors (regression guard).

NOTE: actual reference parity lives in tests/test_oracle_parity.py,
which replays committed IQ captures through literal NumPy ports of the
reference per-sample chains (tests/refdsp_oracle.py) and pins sdrtpu's
output waveform-level.  This file keeps the complementary ABSOLUTE
quality floors: each demodulator must recover a known test tone with at
least the listed SINAD, so a regression that degraded both sdrtpu and
its oracle-tracked behavior equally (e.g. a bad filter design change)
still fails here.
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
    for mode in ("normalized", "regression", "envelope"):
        d = BroadcastFm(samplerate=fs, stereo=True, pilot_mode=mode)
        _, (out, _) = d(d.init_state(), jnp.asarray(iq))
        out = np.asarray(out)[:, 20000:]

        def tone_power(x, f):
            spec = np.abs(np.fft.rfft(x * np.hanning(len(x)))) ** 2
            fr = np.fft.rfftfreq(len(x), 1 / fs)
            return spec[(fr > f - 100) & (fr < f + 100)].sum()

        sep = 10 * np.log10(tone_power(out[0], 1000) / tone_power(out[0], 2500))
        assert sep > 40.0, f"{mode}: separation {sep:.1f} dB"


def test_wbfm_multi_vfo_pipeline_quality():
    """End-to-end quality floor for the flagship bench pipeline.

    Three stereo FM stations at 10 Msps through the default (FFT)
    channelizer -> BroadcastFm -> audio resampler with the 15 kHz audio
    LPF folded into its polyphase prototype.  Guards the whole bench.py
    path: channelization crosstalk, pilot recovery, stereo matrix, and
    the folded filter's passband/stopband.
    """
    from sdrtpu.apps.wbfm_pipeline import WbfmMultiVfoPipeline

    fs_in = 10_000_000.0
    m = WbfmMultiVfoPipeline.block_multiple(fs_in)
    block_len = (500_000 // m) * m
    n_blocks = 2
    n = block_len * n_blocks
    t = np.arange(n) / fs_in
    offsets = np.array([-3.0e6, 0.4e6, 3.2e6])
    tones = [(1000.0, 2500.0), (800.0, 1900.0), (1200.0, 3100.0)]
    x = np.zeros(n, np.complex64)
    rng = np.random.default_rng(7)
    for fc, (fl, fr) in zip(offsets, tones):
        L = 0.8 * np.sin(2 * np.pi * fl * t)
        R = 0.8 * np.sin(2 * np.pi * fr * t)
        mpx = (0.45 * (L + R) + 0.1 * np.sin(2 * np.pi * 19000.0 * t)
               + 0.45 * (L - R) * np.sin(2 * np.pi * 38000.0 * t))
        ph = np.cumsum(2 * np.pi * 75000.0 * mpx / fs_in)
        x += (0.5 * np.exp(1j * (2 * np.pi * fc * t + ph))).astype(np.complex64)

    pipe = WbfmMultiVfoPipeline(offsets, fs_in, block_len)
    st = pipe.init_state()
    outs = []
    for b in range(n_blocks):
        st, a = pipe(st, jnp.asarray(x[b * block_len : (b + 1) * block_len]))
        outs.append(np.asarray(a))
    audio = np.concatenate(outs, axis=-1)  # (2, C, n_af)
    fs_af = 48000.0
    audio = audio[..., 2000:]

    def tone_power(sig, f):
        spec = np.abs(np.fft.rfft(sig * np.hanning(len(sig)))) ** 2
        fr = np.fft.rfftfreq(len(sig), 1 / fs_af)
        return spec[(fr > f - 100) & (fr < f + 100)].sum()

    for c, (fl, fr) in enumerate(tones):
        sep_l = 10 * np.log10(tone_power(audio[0, c], fl) / tone_power(audio[0, c], fr))
        sep_r = 10 * np.log10(tone_power(audio[1, c], fr) / tone_power(audio[1, c], fl))
        s = sinad_db(audio[0, c], fl, fs_af, skip=0)
        assert sep_l > 25.0, f"ch{c}: L separation {sep_l:.1f} dB"
        assert sep_r > 25.0, f"ch{c}: R separation {sep_r:.1f} dB"
        assert s > 25.0, f"ch{c}: SINAD {s:.1f} dB"
