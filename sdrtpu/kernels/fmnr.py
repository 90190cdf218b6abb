"""FM IF noise reduction — block-parallel reformulation.

The reference (``core/src/dsp/noise_reduction/fm_if.h:36-70``) runs, for
*every sample*, a windowed N-point FFT of the sliding window, keeps only
the strongest bin, and inverse-transforms its center element:

    out[i] = (-1)^{k_i} / N * X_{k_i}(i),
    X_k(i) = sum_m x[i+m] * w[m] * e^{-j 2 pi k m / N}

The sliding STFT is just a bank of N FIR filters with modulated-window
taps h_k[m] = w[m] e^{-j 2 pi k m / N}, so the whole block computes as N
parallel complex FIRs, a per-sample argmax over |Y_k|, and a gather —
no per-sample FFT loop.  Identical math, fully parallel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.block import StreamOp
from .fir import correlate_valid
from .windows import periodic_window


class FmIfNoiseReduction(StreamOp):
    """Keep-strongest-bin spectral NR (radio IF chain's "IF NR" toggle)."""

    def __init__(self, bins: int = 32):
        self.bins = int(bins)
        n = self.bins
        w = periodic_window("nuttall", n).astype(np.float64)
        m = np.arange(n)
        k = np.arange(n)[:, None]
        self.taps = (w[None, :] * np.exp(-2j * np.pi * k * m[None, :] / n)).astype(
            np.complex64
        )  # (N, N): filter bank
        self.scale = ((-1.0) ** np.arange(n) / n).astype(np.float32)

    def init_state(self):
        return np.zeros(self.bins - 1, np.complex64)

    def __call__(self, state, x):
        n = x.shape[-1]
        state = jnp.broadcast_to(
            jnp.asarray(state), x.shape[:-1] + (self.bins - 1,)
        )
        ext = jnp.concatenate([state, x.astype(jnp.complex64)], axis=-1)
        # N parallel FIRs -> (N, ..., n)
        ys = jnp.stack(
            [correlate_valid(ext, self.taps[k]) for k in range(self.bins)]
        )
        mags = jnp.abs(ys)
        best = jnp.argmax(mags, axis=0)  # (..., n)
        sel = jnp.take_along_axis(ys, best[None], axis=0)[0]
        out = sel * jnp.asarray(self.scale)[best]
        return ext[..., n:], out
