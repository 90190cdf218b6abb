"""First-order IIR recurrences as parallel (associative) scans.

The reference implements its one-pole filters as per-sample loops:
de-emphasis ``out[i] = a*in[i] + (1-a)*out[i-1]``
(``core/src/dsp/filter/deephasis.h:58-77``) and the DC blocker
``out[i] = in[i] - offset; offset += out[i]*rate``
(``core/src/dsp/correction/dc_blocker.h:54-58``).  Both are *linear*
recurrences ``y[n] = a*y[n-1] + b[n]``, so on TPU we evaluate them with
`lax.associative_scan` in O(log n) depth — fully parallel across the block —
instead of a sequential 48k-step loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.block import StreamOp


def first_order_recurrence(a, b: jax.Array, y0, axis: int = -1) -> jax.Array:
    """Solve y[n] = a[n]*y[n-1] + b[n] (y[-1]=y0) via associative scan.

    ``a`` may be a scalar or an array broadcastable to ``b``.  Composition of
    affine maps (a1,b1) then (a2,b2) is (a1*a2, a2*b1 + b2) — associative.
    """
    a_arr = jnp.broadcast_to(jnp.asarray(a, b.dtype), b.shape)

    def comb(l, r):
        al, bl = l
        ar, br = r
        return (al * ar, bl * ar + br)

    A, B = jax.lax.associative_scan(comb, (a_arr, b), axis=axis)
    return A * y0 + B


class Deemphasis(StreamOp):
    """FM de-emphasis one-pole lowpass (``deephasis.h``).

    ``alpha = dt / (tau + dt)``; tau is 50e-6/75e-6 s (or 22e-6 for NFM).
    Works on real blocks shaped (..., n) — e.g. (2, n) stereo.

    For audio-rate poles the impulse response ``alpha * a^k`` underflows
    float32 within a few dozen samples, so the recurrence is evaluated as a
    truncated-impulse FIR (one fused shift-and-add over T taps, exact to
    float precision) plus an ``a^{n+1} * y0`` boundary term for the carry —
    fully parallel, no scan.  Poles with memory longer than `_FIR_MAX_TAPS`
    fall back to the associative scan.
    """

    _FIR_EPS = 1e-9
    _FIR_MAX_TAPS = 256

    def __init__(self, tau: float, samplerate: float, channels: int = 1,
                 mm_precision: str = "high",
                 mm_min_elements: int = 1 << 15):
        dt = 1.0 / float(samplerate)
        self.alpha = np.float32(dt / (float(tau) + dt))
        self.channels = channels
        # Path selection is batch-size dependent (matmul above
        # mm_min_elements total elements, exact unroll below), so the
        # same stream at different batchings is not bit-identical.
        # Callers needing bit-stable output across batchings can pin one
        # path: mm_min_elements=0 (always matmul) or a huge value
        # (always unroll), and pick the contraction precision as Fir
        # does with mm_precision.
        self.mm_precision = mm_precision
        self.mm_min_elements = int(mm_min_elements)
        a = 1.0 - float(self.alpha)
        T = int(np.ceil(np.log(self._FIR_EPS) / np.log(a))) if a > 0 else 1
        if T <= self._FIR_MAX_TAPS:
            k = np.arange(T, dtype=np.float64)
            # correlate_valid orientation: out[n] = sum_t ext[n+t]*h[t]
            # with ext = [T-1 zeros ++ x]; h[t] = alpha * a^(T-1-t).
            self._fir = (float(self.alpha) * a ** (T - 1 - k)).astype(np.float32)
            self._ntaps = T
        else:
            self._fir = None

    def init_state(self):
        if self.channels == 1:
            return np.zeros((), np.float32)
        return np.zeros((self.channels, 1), np.float32)

    def __call__(self, state, x):
        state = jnp.asarray(state)
        if self._fir is None:
            y = first_order_recurrence(
                np.float32(1.0) - self.alpha, self.alpha * x, state
            )
            return y[..., -1:], y
        from .fir import correlate_valid, matmul_correlate_valid

        T = self._ntaps
        n = x.shape[-1]
        pad = [(0, 0)] * (x.ndim - 1) + [(T - 1, 0)]
        xpad = jnp.pad(x, pad)
        # Large batched blocks (the flagship's (2, C, n) audio): the
        # banded-Toeplitz MXU form is 6x faster than the T-AXPY unroll
        # (0.0067 vs 0.041 ms at the 64-VFO shape, exp/demod64.py round
        # 4c); bf16x3 noise ~-95 dB, far under the audio SINAD floors.
        # Small single-stream blocks keep the fused unroll (matmul
        # padding would dominate).
        total = 1
        for s in x.shape:
            total *= int(s)
        if total >= self.mm_min_elements:
            y = matmul_correlate_valid(xpad, self._fir,
                                       precision=self.mm_precision)
        else:
            y = correlate_valid(xpad, self._fir)
        # carry term a^(n+1)*y0: nonzero only in the first T outputs
        a = 1.0 - np.float64(self.alpha)
        decay = np.zeros(n, np.float32)
        m = min(T, n)
        decay[:m] = (a ** (np.arange(m, dtype=np.float64) + 1.0)).astype(np.float32)
        y = y + jnp.asarray(decay) * state
        # keepdims so the state broadcasts against any (..., n) batch shape
        return y[..., -1:], y


class DcBlocker(StreamOp):
    """DC tracking subtractor (``dc_blocker.h:54-58``).

    offset[n] = (1-rate)*offset[n-1] + rate*x[n];  out[n] = x[n] - offset[n-1].
    Default rate matches ``IQFrontEnd`` usage (rate set per samplerate).
    """

    def __init__(self, rate: float, dtype=jnp.complex64):
        self.rate = np.float32(rate)
        self.dtype = dtype

    def init_state(self):
        return np.zeros((), np.dtype(self.dtype))

    def __call__(self, state, x):
        state = jnp.asarray(state)
        rate = jnp.asarray(self.rate, x.dtype)
        offsets = first_order_recurrence(1.0 - rate, rate * x, state)
        # last-axis ops so batched (..., n) blocks work like the sibling
        # ops (state broadcasts across the leading axes)
        prev = jnp.concatenate(
            [jnp.broadcast_to(state, offsets[..., :1].shape),
             offsets[..., :-1]],
            axis=-1,
        )
        new_state = offsets[..., -1] if offsets.ndim == 1 else offsets[..., -1:]
        return new_state, x - prev
