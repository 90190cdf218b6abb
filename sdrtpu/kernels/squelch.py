"""Squelch and noise reduction ops.

- `PowerSquelch` (``noise_reduction/power_squelch.h:33-50``): gates the
  whole work block to zero when the mean amplitude in dB is below the
  threshold — the reference is equally block-granular, so parity is exact.
- `NoiseBlanker` (``noise_reduction/noise_blanker.h:38-57``): one-pole
  average of |x| (a *linear* recurrence -> associative scan) and a gain of
  1/excess for samples whose amplitude exceeds ``level`` times the average.

CTCSS squelch and the FM-IF spectral NR live in `ctcss.py` / `fmnr.py`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.block import StreamOp
from .iir import first_order_recurrence


class PowerSquelch(StreamOp):
    """Zero the block when 10*log10(mean |x|) < level (dB)."""

    def __init__(self, level_db: float = -50.0):
        self.level_db = np.float32(level_db)

    def init_state(self):
        return ()

    def __call__(self, state, x):
        mean_amp = jnp.mean(jnp.abs(x), axis=-1, keepdims=True)
        open_ = 10.0 * jnp.log10(jnp.maximum(mean_amp, 1e-20)) >= self.level_db
        return state, jnp.where(open_, x, 0.0)


class NoiseBlanker(StreamOp):
    """Impulse blanker: attenuate samples whose amplitude spikes above
    ``level`` times the running average.  Radio defaults: rate=500/24000,
    level=10 (``radio_module.h:90``)."""

    def __init__(self, rate: float = 500.0 / 24000.0, level: float = 10.0):
        self.rate = np.float32(rate)
        self.level = np.float32(level)

    def init_state(self):
        return np.float32(1.0)

    def __call__(self, state, x):
        state = jnp.asarray(state)
        amps = jnp.abs(x).astype(jnp.float32)
        # the reference SKIPS the average update on zero-amplitude
        # samples (noise_blanker.h:38-57) — without this, an all-zero
        # stretch (closed squelch upstream) decays the average toward 0
        # and the first real samples after it are crushed by 1/excess.
        # Conditional hold is still a first-order affine recurrence with
        # per-sample coefficients: zero samples get (a=1, b=0).
        live = amps != 0.0
        a = jnp.where(live, np.float32(1.0) - self.rate, np.float32(1.0))
        b = jnp.where(live, self.rate * amps, np.float32(0.0))
        avg = first_order_recurrence(a, b, state)
        # reference updates amp *before* computing excess for the sample
        excess = amps / jnp.maximum(avg, 1e-20)
        gain = jnp.where(excess > self.level, 1.0 / excess, 1.0)
        gain = jnp.where(amps != 0.0, gain, 1.0)
        new_state = avg[..., -1] if avg.ndim == 1 else avg[..., -1:]
        return new_state, x * gain.astype(x.real.dtype)
