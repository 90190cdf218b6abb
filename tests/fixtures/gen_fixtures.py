"""Generate the committed IQ capture fixtures (WAV) for the parity suite.

Run from the repo root:  python tests/fixtures/gen_fixtures.py

Deterministic (seeded) synthetic captures mirroring the reference's
de-facto fixture mechanism — WAV replay through file_source
(``source_modules/file_source/src/main.cpp:154-181``).  Each capture is a
short IQ recording at the radio module's IF rate for its mode
(``decoder_modules/radio/src/demodulators/*.h`` getIFSampleRate), stored
as int16 like real SDR++ recordings (``misc_modules/recorder``).

The WAVs are committed so tests replay bit-identical captures; this
script only exists to document/regenerate them.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from sdrtpu.io.wav import write_iq_wav  # noqa: E402
from sdrtpu.decoders.rds import encode_group  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


def _fm_modulate(mpx: np.ndarray, deviation: float, fs: float) -> np.ndarray:
    phase = 2.0 * np.pi * deviation * np.cumsum(mpx) / fs
    return np.exp(1j * phase)


def _noise(rng, n, level):
    return level * (rng.standard_normal(n) + 1j * rng.standard_normal(n)) / np.sqrt(2)


def rds_group_bits() -> np.ndarray:
    """The planted RDS payload: PI 0xF00D, PS name 'SDRTPU  ' (group 0B)."""
    name = b"SDRTPU  "
    groups = []
    for seg in range(4):
        d = (name[seg * 2] << 8) | name[seg * 2 + 1]
        groups.append(encode_group(0xF00D, 0, 0, seg, 0, d))
    return np.concatenate(groups)


def rds_baseband(n: int, fs: float) -> np.ndarray:
    """Shaped biphase RDS baseband at fs (unit amplitude).

    bits -> differential encode -> biphase (bit 1 = +-, bit 0 = -+) at
    2 x 1187.5 half-symbols/s -> ~2.4 kHz lowpass shaping.
    """
    bits = rds_group_bits()
    # differential encode (RdsDemod differentially decodes)
    enc = np.zeros(len(bits), np.uint8)
    last = 0
    for i, b in enumerate(bits):
        last = last ^ int(b)
        enc[i] = last
    half_rate = 2375.0
    t = np.arange(n) / fs
    half_idx = np.floor(t * half_rate).astype(np.int64)
    bit_idx = (half_idx // 2) % len(enc)
    sign = np.where(enc[bit_idx] == 1, 1.0, -1.0)
    biphase = np.where(half_idx % 2 == 0, sign, -sign)
    # shape: simple windowed-sinc lowpass at 2.4 kHz
    ntaps = 401
    k = np.arange(ntaps) - ntaps // 2
    h = np.sinc(2 * 2400.0 / fs * k) * np.hanning(ntaps)
    h /= h.sum()
    shaped = np.convolve(biphase, h, mode="same")
    return shaped / np.abs(shaped).max()


def _stereo_subcarrier_phase(fs: float) -> float:
    """Phase offset aligning the 38 kHz subcarrier with the demod's VCO.

    The WFM decoder multiplies the (d = (T-1)/2 + 1)-delayed MPX by
    conj(vco)^2 where the VCO tracks the *pilot-bandpass output*
    (``broadcast_fm.h:46-47,169-171``); the bandpass
    (``taps::bandPass(18750, 19250, 3000)``) has a non-trivial phase
    angle(G(w19)) at the pilot frequency on top of its group delay, and
    the PLL output lags its input by one sample.  Full decode gain
    cos(2*delta_phi) = 1 requires the transmitted subcarrier phase to be
    2*(theta + angle(G) + w19*(d-1)) when the pilot is cos(theta) —
    exactly the alignment a real broadcast chain ends up at after the
    reference's own filters.
    """
    from sdrtpu.kernels import taps as tapsmod

    taps = tapsmod.band_pass(18750.0, 19250.0, 3000.0, fs,
                             odd_tap_count=True)
    T = len(taps)
    d = (T - 1) // 2 + 1
    w19 = 2.0 * np.pi * 19_000.0 / fs
    # correlation convention: out[i] = sum_t buf[i+t]*taps[t]
    G = np.sum(taps * np.exp(-1j * w19 * (T - 1 - np.arange(T))))
    return float(np.angle(G) + w19 * (d - 1))


def make_wfm_stereo_rds(rng) -> None:
    fs = 250_000.0
    dur = 1.2
    n = int(fs * dur)
    t = np.arange(n) / fs
    left = 0.8 * np.sin(2 * np.pi * 440.0 * t)
    right = 0.6 * np.sin(2 * np.pi * 1200.0 * t)
    lpr = (left + right) / 2.0
    lmr = (left - right) / 2.0
    theta = 2.0 * np.pi * 19_000.0 * t
    phi_s = _stereo_subcarrier_phase(fs)
    mpx = (
        0.45 * lpr
        + 0.09 * np.cos(theta)
        + 0.45 * lmr * np.cos(2.0 * (theta + phi_s))
        + 0.055 * rds_baseband(n, fs) * np.cos(3.0 * theta)
    )
    iq = _fm_modulate(mpx, 75_000.0, fs) + _noise(rng, n, 0.003)
    write_iq_wav(os.path.join(HERE, "wfm_stereo_rds_250k.wav"), int(fs),
                 (0.9 * iq).astype(np.complex64))


def make_nfm(rng) -> None:
    fs = 50_000.0
    n = int(fs * 0.4)
    t = np.arange(n) / fs
    audio = 0.7 * np.sin(2 * np.pi * 1000.0 * t) + 0.3 * np.sin(
        2 * np.pi * 2100.0 * t + 0.7
    )
    iq = _fm_modulate(audio, 6250.0 * 0.8, fs) + _noise(rng, n, 0.01)
    write_iq_wav(os.path.join(HERE, "nfm_50k.wav"), int(fs),
                 (0.9 * iq).astype(np.complex64))


def make_am(rng) -> None:
    fs = 15_000.0
    n = int(fs * 0.5)
    t = np.arange(n) / fs
    audio = 0.4 * np.sin(2 * np.pi * 1000.0 * t) + 0.2 * np.sin(
        2 * np.pi * 2500.0 * t
    )
    iq = (1.0 + audio) * np.exp(1j * 2 * np.pi * 12.0 * t)  # small CFO
    iq = 0.45 * iq + _noise(rng, n, 0.004)
    write_iq_wav(os.path.join(HERE, "am_15k.wav"), int(fs),
                 iq.astype(np.complex64))


def _analytic(x: np.ndarray) -> np.ndarray:
    X = np.fft.fft(x)
    h = np.zeros(len(x))
    h[0] = 1.0
    h[1: len(x) // 2] = 2.0
    h[len(x) // 2] = 1.0
    return np.fft.ifft(X * h)


def make_ssb(rng) -> None:
    """USB capture: audio spectrum [0, bw] centered on 0 (VFO mid-band)."""
    fs = 24_000.0
    bw = 2800.0
    n = int(fs * 0.5)
    t = np.arange(n) / fs
    audio = 0.7 * np.sin(2 * np.pi * 700.0 * t) + 0.5 * np.sin(
        2 * np.pi * 1900.0 * t + 1.1
    )
    usb = _analytic(audio) * np.exp(-1j * 2 * np.pi * (bw / 2.0) * t)
    iq = 0.5 * usb + _noise(rng, n, 0.004)
    write_iq_wav(os.path.join(HERE, "ssb_usb_24k.wav"), int(fs),
                 iq.astype(np.complex64))


def make_cw(rng) -> None:
    fs = 3_000.0
    n = int(fs * 0.8)
    t = np.arange(n) / fs
    # on-off keying: 50 ms dits of "sdr" spaced out, carrier at 0 Hz
    key = (np.floor(t / 0.05).astype(int) % 3 != 2).astype(float)
    iq = 0.6 * key * np.exp(1j * 2 * np.pi * 2.0 * t) + _noise(rng, n, 0.006)
    write_iq_wav(os.path.join(HERE, "cw_3k.wav"), int(fs),
                 iq.astype(np.complex64))


def make_meteor(rng) -> None:
    """Meteor M2 LRPT-style QPSK: 72 ksym/s at 150 ksps, RRC beta=0.6."""
    from sdrtpu.kernels import taps as tapsmod

    fs = 150_000.0
    sym_rate = 72_000.0
    dur = 0.4
    n_sym = int(sym_rate * dur)
    symbols = (rng.integers(0, 2, (n_sym, 2)) * 2 - 1).astype(np.float64)
    c = (symbols[:, 0] + 1j * symbols[:, 1]) / np.sqrt(2)
    # transmit pulse shaping: upsample to fs on a fractional grid
    n = int(fs * dur)
    t = np.arange(n) / fs
    sym_pos = t * sym_rate
    # RRC transmit filter evaluated per (sample, nearby symbol) pair
    span = 8
    base = np.floor(sym_pos).astype(np.int64)
    x = np.zeros(n, np.complex128)
    beta, Ts = 0.6, 1.0
    for k in range(-span, span + 1):
        idx = base + k
        valid = (idx >= 0) & (idx < n_sym)
        dt = sym_pos - idx  # symbol periods
        h = _rrc_pulse(dt, beta)
        x += np.where(valid, h * c[np.clip(idx, 0, n_sym - 1)], 0.0)
    x /= np.abs(x).max()
    cfo = np.exp(1j * (2 * np.pi * 300.0 * t + 0.4))  # 300 Hz offset
    iq = 0.8 * x * cfo + _noise(rng, n, 0.02)
    write_iq_wav(os.path.join(HERE, "meteor_qpsk_150k.wav"), int(fs),
                 iq.astype(np.complex64))


def _rrc_pulse(dt: np.ndarray, beta: float) -> np.ndarray:
    """Root-raised-cosine pulse h(t), t in symbol periods."""
    t = np.asarray(dt, np.float64)
    out = np.empty_like(t)
    eps = 1e-9
    t0 = np.abs(t) < eps
    tb = np.abs(np.abs(4 * beta * t) - 1.0) < eps
    safe = ~(t0 | tb)
    ts = np.where(safe, t, 1.0)
    num = np.sin(np.pi * ts * (1 - beta)) + 4 * beta * ts * np.cos(
        np.pi * ts * (1 + beta)
    )
    den = np.pi * ts * (1 - (4 * beta * ts) ** 2)
    out = np.where(safe, num / den, 0.0)
    out = np.where(t0, 1.0 - beta + 4 * beta / np.pi, out)
    out = np.where(
        tb,
        (beta / np.sqrt(2.0))
        * ((1 + 2 / np.pi) * np.sin(np.pi / (4 * beta))
           + (1 - 2 / np.pi) * np.cos(np.pi / (4 * beta))),
        out,
    )
    return out


def main() -> None:
    rng = np.random.default_rng(20260820)
    make_wfm_stereo_rds(rng)
    make_nfm(rng)
    make_am(rng)
    make_ssb(rng)
    make_cw(rng)
    make_meteor(rng)
    print("fixtures written to", HERE)


if __name__ == "__main__":
    main()
