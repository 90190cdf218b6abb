"""FFT spectrum / waterfall computation.

Replaces the reference FFT branch — Reshaper keep/skip framing
(``core/src/dsp/buffer/reshaper.h:101-128``), window multiply, FFTW
execute, and dB power spectrum (``core/src/signal_path/
iq_frontend.cpp:248-267``) — with one batched jnp.fft over all frames in a
block.

Framing math matches ``IQFrontEnd::genReshapeParams``
(``iq_frontend.h:59-63``): per FFT interval ``round(fs/fft_rate)`` input
samples, of which ``nz = min(interval, fft_size)`` are windowed (zero-padded
to ``fft_size``) and the rest skipped.  The reference centers spectra by
multiplying the window with (-1)^i (``iq_frontend.cpp:287-290``); we do the
same for even sizes (identical to fftshift, without the shift's copy pass)
and fall back to an explicit ``fftshift`` for odd sizes.

dB conversion: ``10*log10(|X|^2 / fft_size^2)`` — the same shape as VOLK's
power-spectrum kernel with normalization ``fft_size``
(``iq_frontend.cpp:261``); any constant offset is irrelevant to display,
SNR estimation and squelch thresholds.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..graph.block import StreamOp
from .windows import periodic_window


def gen_reshape_params(samplerate: float, fft_size: int, fft_rate: float):
    """(skip, nz_samp_count) per ``IQFrontEnd::genReshapeParams``."""
    fft_interval = round(samplerate / fft_rate)
    nz = min(fft_interval, fft_size)
    return fft_interval - nz, nz


def four_step_fft(x: jnp.ndarray, n1: int | None = None) -> jnp.ndarray:
    """Length-N FFT of the last axis as two batched small FFTs.

    A single long FFT row is the slowest shape on this TPU backend (one
    65536-pt row costs ~0.03 ms; the same points as a (128, 512) batch
    cost ~0.004).  Standard four-step Cooley-Tukey: with N = N1*N2 and
    n = n1*N2 + n2, k = k2*N1 + k1,

        A[n2, k1] = FFT_N1(x[n1, n2] over n1)
        B[k1, k2] = FFT_N2(A[n2, k1] * W^(k1*n2) over n2)
        X[k2*N1 + k1] = B[k1, k2]

    Exact (same floating-point class of error as the direct FFT).
    """
    N = int(x.shape[-1])
    if n1 is None:
        # Asymmetric split: a small first factor with a large batch side
        # measures fastest on v5e (N=65536: n1=64 -> 9.8 us vs the square
        # 256x256 split's 24.5 us — the wide batch keeps the vector lanes
        # full on the inner FFTs).
        n1 = 1 << max(0, int(np.log2(max(N, 2))) // 2 - 2)
        while n1 > 1 and N % n1:  # N need not be a power of two
            n1 >>= 1
    n2 = N // n1
    assert n1 * n2 == N, (N, n1)
    lead = x.shape[:-1]
    x2 = x.reshape(lead + (n1, n2))
    a = jnp.fft.fft(jnp.swapaxes(x2, -1, -2))  # (..., n2, n1) -> A[n2, k1]
    k1 = np.arange(n1)[None, :]
    nn2 = np.arange(n2)[:, None]
    w = np.exp(-2j * np.pi * (k1 * nn2) / N).astype(np.complex64)
    b = jnp.fft.fft(jnp.swapaxes(a * jnp.asarray(w), -1, -2))  # B[k1, k2]
    return jnp.swapaxes(b, -1, -2).reshape(lead + (N,))


class SpectrumAnalyzer(StreamOp):
    """Block of IQ -> (frames, fft_size) centered dB spectra.

    Block lengths must be a multiple of the FFT interval (keep+skip) so each
    block yields a static number of frames; the framing layer guarantees
    this.  The waterfall view (zoom, palette) consumes these arrays
    host-side (`sdrtpu/apps/waterfall.py`).
    """

    def __init__(
        self,
        samplerate: float,
        fft_size: int = 65536,
        fft_rate: float = 20.0,
        window: str = "nuttall",
    ):
        self.samplerate = float(samplerate)
        self.fft_size = int(fft_size)
        self.fft_rate = float(fft_rate)
        skip, nz = gen_reshape_params(samplerate, fft_size, fft_rate)
        self.skip = skip
        self.nz_size = nz
        self.interval = skip + nz
        # Fold the reference's (-1)^i centering trick
        # (``iq_frontend.cpp:287-290``) into the window: for even fft_size
        # it equals fftshift of the output spectrum, without the shift's
        # gather/copy pass.
        w = periodic_window(window, nz).astype(np.float64)
        self._center_in_window = self.fft_size % 2 == 0
        if self._center_in_window:
            w *= (-1.0) ** np.arange(nz)
        self.window = w.astype(np.float32)

    def init_state(self):
        return ()

    def out_len(self, n: int) -> int:
        assert n % self.interval == 0, (
            f"block length {n} must be a multiple of FFT interval {self.interval}"
        )
        return n // self.interval

    def extract(self, x):
        """Keep/skip framing only: block -> (frames, nz_size) raw segments.

        Split out from `transform` so a batched caller (the flagship's
        `scan_call`) can collect cheap slices per block inside a scan and
        run ONE windowed FFT over every frame of the dispatch window.
        """
        n = x.shape[-1]
        return x.reshape(n // self.interval, self.interval)[:, : self.nz_size]

    def transform(self, segments):
        """(frames, nz_size) raw segments -> (frames, fft_size) dB."""
        frames = segments * jnp.asarray(self.window)
        if self.nz_size < self.fft_size:
            frames = jnp.pad(frames, ((0, 0), (0, self.fft_size - self.nz_size)))
        if self.fft_size >= 16384 and frames.shape[0] <= 8:
            spec = four_step_fft(frames)
        else:
            spec = jnp.fft.fft(frames, axis=-1)
        if not self._center_in_window:  # odd sizes: explicit shift
            spec = jnp.fft.fftshift(spec, axes=-1)
        power = spec.real**2 + spec.imag**2
        db = 10.0 * jnp.log10(power / np.float32(self.fft_size**2) + 1e-20)
        return db.astype(jnp.float32)

    def __call__(self, state, x):
        return state, self.transform(self.extract(x))
