"""Golden tests for tap/window design vs NumPy/SciPy reference math."""

import numpy as np
import scipy.signal as sig

from sdrtpu.kernels import taps, windows


def freq_response(h, worN=4096, fs=1.0):
    w, H = sig.freqz(h, worN=worN, fs=fs)
    return w, np.abs(H)


class TestWindows:
    def test_nuttall_peak_and_edges(self):
        n = np.linspace(-64, 0, 1001)
        w = windows.get_window("nuttall", n, 64)
        assert abs(w.max() - 1.0) < 1e-6  # peak (sum of coefs) at center
        assert abs(w[0]) < 1e-6 and abs(w[-1]) < 1e-6

    def test_hann_matches_textbook(self):
        N = 128
        i = np.arange(N)
        ours = windows.periodic_window("hann", N)
        textbook = 0.5 - 0.5 * np.cos(2 * np.pi * i / N)
        np.testing.assert_allclose(ours, textbook, atol=1e-12)


class TestLowPass:
    def test_tap_count(self):
        assert taps.estimate_tap_count(4000.0, 250000.0) == int(3.8 * 250000 / 4000)

    def test_dc_gain_unity(self):
        h = taps.low_pass(15000.0, 4000.0, 250000.0)
        assert abs(h.sum() - 1.0) < 1e-2

    def test_passband_flat_stopband_deep(self):
        fs = 250000.0
        h = taps.low_pass(15000.0, 4000.0, fs)
        w, H = freq_response(h, fs=fs)
        passband = H[w < 12000.0]
        stopband = H[w > 19000.0]
        assert np.all(np.abs(20 * np.log10(passband)) < 0.5)
        assert np.all(20 * np.log10(np.maximum(stopband, 1e-12)) < -60.0)

    def test_cutoff_half_amplitude(self):
        fs = 48000.0
        h = taps.low_pass(8000.0, 2000.0, fs)
        w, H = freq_response(h, fs=fs)
        idx = np.argmin(np.abs(w - 8000.0))
        assert abs(H[idx] - 0.5) < 0.05  # -6 dB at cutoff for windowed sinc


class TestHighPass:
    def test_response(self):
        fs = 48000.0
        h = taps.high_pass(300.0, 100.0, fs)
        w, H = freq_response(h, 1 << 14, fs=fs)
        assert np.all(
            20 * np.log10(np.maximum(H[w < 150.0], 1e-12)) < -40.0
        )
        assert np.all(np.abs(20 * np.log10(H[(w > 450) & (w < 20000)])) < 0.5)


class TestBandPass:
    def test_complex_is_asymmetric(self):
        fs = 250000.0
        h = taps.band_pass(18750.0, 19250.0, 3000.0, fs, odd_tap_count=True)
        assert h.dtype == np.complex64
        # As used by the correlation FIR, the response at frequency f is
        # |sum_t h[t] e^{+j w t}|: +19 kHz passes, -19 kHz is rejected
        # (analytic filter).  Absolute gain (~0.22) matches the reference's
        # under-normalized narrow bandpass — the pilot PLL renormalizes.
        n = np.arange(len(h))
        probe = lambda f: abs(np.sum(h * np.exp(2j * np.pi * f / fs * n)))
        peak = probe(19000.0)
        assert peak > 0.1
        assert probe(-19000.0) < 1e-4 * peak
        assert probe(15000.0) < 1e-2 * peak

    def test_real_symmetric(self):
        fs = 250000.0
        h = taps.band_pass(
            18750.0, 19250.0, 3000.0, fs, odd_tap_count=True, complex_taps=False
        )
        assert h.dtype == np.float32
        w, H = freq_response(h, 1 << 15, fs=fs)
        peak_f = w[np.argmax(H)]
        assert abs(peak_f - 19000.0) < 50.0
        assert np.all(H[w < 15000.0] < 0.01 * H.max())
        assert np.all(H[w > 23000.0] < 0.01 * H.max())


class TestRrc:
    def test_matches_commpy_style_formula(self):
        # Unit-energy sanity + symmetry + peak at center.
        h = taps.root_raised_cosine_rate(33, 0.6, 72000.0, 150000.0)
        assert len(h) == 33
        np.testing.assert_allclose(h, h[::-1], rtol=1e-5)
        assert np.argmax(h) in (16,)

    def test_rc_is_rrc_convolved(self):
        # RC(f) = RRC(f)^2 — check in frequency domain loosely.
        Ts = 4.0
        rrc = taps.root_raised_cosine(257, 0.35, Ts).astype(np.float64)
        H = np.abs(np.fft.rfft(rrc, 8192)) ** 2
        rc_equiv = np.convolve(rrc, rrc)
        H2 = np.abs(np.fft.rfft(rc_equiv, 8192))
        np.testing.assert_allclose(H / H.max(), H2 / H2.max(), atol=5e-3)
