"""Analog TV decoder (``decoder_modules/atv_decoder`` capability).

The reference tracks horizontal sync with a per-sample feedback loop over
945-sample lines (``atv_decoder/src/linesync.h``: sync tip at -0.428,
70-sample sync pulses, 128-phase polyphase interpolator for sub-sample
timing).  The TPU-native redesign is block-parallel:

- AM/VSB envelope -> normalized video (sync tip ~ -0.4, white ~ 1.0),
- the *average line profile* of a block (fold modulo the line length and
  average) localizes the horizontal sync pulse in one argmin — no
  per-sample loop; parabolic interpolation of the moving-average minimum
  gives the sub-sample phase, and lines are gathered with linear
  interpolation at that fractional offset (the block-parallel equivalent
  of the reference's per-pixel polyphase NCO, ``linesync.h:100-118``),
- per-line sync classification (short/equalizing vs long/broad pulses,
  ``atv_decoder/src/main.cpp:164-176``) feeds the reference's 16-bit
  sync-history patterns to find odd/even FIELD starts, and
  `AtvFrameAssembler` interleaves the two fields into full frames with
  the reference's ypos cadence (``main.cpp:236-280``).

Works on whole blocks of many lines; the line phase is carried between
blocks.  Line/frame assembly is host NumPy (line rate is kHz-class).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..graph.block import StreamOp

LINE_SIZE = 945        # samples per line at the reference's video rate
SYNC_LEN = 70
SYNC_LEVEL = -0.428
EQUAL_LEN = 35         # equalizing-pulse width (linesync.h:17)
HBLANK_START = 70      # horizontal blanking interval (linesync.h:19-21)
HBLANK_END = 155       # inclusive
ACTIVE_START = 155     # first rendered pixel (main.cpp:230)
ACTIVE_WIDTH = 768
FRAME_HEIGHT = 576     # rendered PAL frame (main.cpp:39)
Y_OFFSET = 34          # first visible ypos (main.cpp:227)


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
    """Sub-sample phase of the horizontal sync within a line (float32).

    Folds the block modulo ``line_size``, averages, and localizes the
    sync-length moving-average minimum over the (circular) profile.  The
    sub-sample refinement is the half-level crossing of the LEADING sync
    edge on the averaged profile — the classical video timing reference
    point: the crossing of (blank+sync)/2 moves linearly with a
    fractional timing offset (a parabola over the moving-average dip is
    biased, because the dip is triangular with asymmetric shoulders, not
    quadratic).  This is the block-parallel counterpart of the
    reference's per-pixel polyphase interpolator timing loop
    (``linesync.h:100-156``).
    """
    n = video.shape[-1] // line_size * line_size
    prof = video[:n].reshape(-1, line_size).mean(axis=0)
    prof2 = jnp.concatenate([prof, prof[:sync_len]])
    # moving average via cumsum
    cs = jnp.concatenate([jnp.zeros(1), jnp.cumsum(prof2)])
    ma = (cs[sync_len:] - cs[:-sync_len]) / sync_len  # start positions
    ma = ma[:line_size]
    p = jnp.argmin(ma)  # coarse: pulse starts near index p
    # local profile around the leading edge (circular gather)
    offs = jnp.arange(-8, 8)
    a = prof[(p + offs) % line_size]  # a[k] = prof[p - 8 + k]
    blank = jnp.mean(a[0:5])          # offs -8..-4: porch before the edge
    sync = jnp.mean(a[10:15])         # offs  2..6: inside the pulse
    mid = 0.5 * (blank + sync)
    # falling half-level crossing between consecutive samples
    left = a[:-1]
    right = a[1:]
    falling = (left >= mid) & (right < mid)
    k = jnp.argmax(falling)  # first crossing in the window
    frac = (left[k] - mid) / jnp.maximum(left[k] - right[k], 1e-9)
    delta = (k.astype(jnp.float32) - 8.0) + frac + 0.5
    # guard: without a clean edge (all-sync/all-blank pathologies) fall
    # back to the coarse argmin
    delta = jnp.where(jnp.any(falling), jnp.clip(delta, -2.0, 2.0), 0.0)
    return p.astype(jnp.float32) + delta


class AtvLineSync(StreamOp):
    """Video samples -> (lines, line_size) image rows, sub-sample aligned.

    Block length must be a multiple of ``line_size``; the previous tail is
    carried so consecutive blocks stay aligned.  Rows are gathered with
    linear interpolation at the estimated fractional sync phase — the
    block-parallel stand-in for the reference's 128-phase polyphase
    interpolator (``linesync.h:114-118``).
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
        phase = line_phase(video, self.line_size)  # float32, sub-sample
        rows = n // self.line_size
        pos = phase + jnp.arange(rows * self.line_size, dtype=jnp.float32)
        i0 = jnp.floor(pos).astype(jnp.int32)
        frac = pos - i0.astype(jnp.float32)
        m = n + self.line_size
        # CLAMP (not wrap): a refined phase slightly outside [0, line)
        # must repeat the edge sample, never alias the opposite end of
        # the block (a modulo here would splice the newest sample into
        # the first pixel whenever the refinement goes negative)
        i0 = jnp.clip(i0, 0, m - 2)
        a = ext[i0]
        b = ext[i0 + 1]
        lines = (a * (1.0 - frac) + b * frac).reshape(rows, self.line_size)
        new_state = ext[-self.line_size:]
        return new_state, lines


def detect_field_starts(lines: np.ndarray, frac: float = 0.6) -> np.ndarray:
    """Indices of lines inside vertical blanking (mostly at sync level)."""
    lv = np.asarray(lines)
    dark = (lv < SYNC_LEVEL / 2).mean(axis=1)
    return np.where(dark > frac)[0]


def classify_sync(lines: np.ndarray) -> np.ndarray:
    """Per-line sync type: 0 = normal, 1 = short (equalizing), 2 = long.

    The reference's classifier (``atv_decoder/src/main.cpp:164-166``):
    with L = mean of the first EQUAL_LEN samples, R = mean of the rest of
    the sync window, B = mean of the horizontal blanking interval,

        short: L < SYNC_LEVEL/2, R > SYNC_LEVEL/2, B > SYNC_LEVEL/2
        long:  L < SYNC_LEVEL/2, R < SYNC_LEVEL/2, B < SYNC_LEVEL/2

    A normal video line (full-width sync, bright blanking) matches
    neither and codes as 0.
    """
    lv = np.asarray(lines, np.float32)
    L = lv[:, :EQUAL_LEN].mean(axis=1)
    R = lv[:, EQUAL_LEN:SYNC_LEN].mean(axis=1)
    B = lv[:, HBLANK_START:HBLANK_END + 1].mean(axis=1)
    half = 0.5 * SYNC_LEVEL
    short = (L < half) & (R > half) & (B > half)
    long_ = (L < half) & (R < half) & (B < half)
    return (short.astype(np.uint8) + 2 * long_.astype(np.uint8))


# 8-line sync histories marking a field start, two bits per line
# (``main.cpp:242-244``); the odd and even patterns differ because the
# vertical-sync pulse train is offset by half a line between fields.
SYNC_TO_ODD = 0b0101011010010101
SYNC_TO_EVEN = 0b0001011010100101


class AtvFrameAssembler:
    """Streaming lines -> interlaced PAL frames with field parity.

    Functional port of the reference's field logic
    (``atv_decoder/src/main.cpp:236-280``): a 16-bit rolling history of
    2-bit sync codes is matched against the odd/even field signatures;
    625-line rollover acts as flywheel; odd fields write rows 1,3,5,…
    and even fields rows 0,2,4,… of a (576, 768) frame buffer that is
    emitted when the even field starts.  `vlock` counts agreement
    between the flywheel and the detected syncs exactly as the
    reference's vertical-lock indicator does.
    """

    def __init__(self):
        self.frame = np.zeros((FRAME_HEIGHT, ACTIVE_WIDTH), np.float32)
        self.history = 0
        self.ypos = 0
        self.line = 0
        self.vlock = 0
        self.frames: list[np.ndarray] = []

    def process(self, lines: np.ndarray) -> list[np.ndarray]:
        """Feed (rows, LINE_SIZE) sync-aligned lines; returns any frames
        completed during this call."""
        lines = np.asarray(lines, np.float32)
        codes = classify_sync(lines)
        out: list[np.ndarray] = []
        for row, code in zip(lines, codes):
            self.history = ((self.history << 2) | int(code)) & 0xFFFF
            if Y_OFFSET <= self.ypos <= Y_OFFSET + FRAME_HEIGHT - 1:
                px = row[ACTIVE_START:ACTIVE_START + ACTIVE_WIDTH]
                self.frame[self.ypos - Y_OFFSET] = np.clip(px, 0.0, 1.0)
            roll_odd = self.ypos == 624
            roll_even = self.ypos == 623
            sync_odd = self.history == SYNC_TO_ODD
            sync_even = self.history == SYNC_TO_EVEN
            if roll_odd or sync_odd:
                self._lock(roll_odd ^ sync_odd)
                self.ypos = 1
                self.line += 1
            elif roll_even or sync_even:
                self._lock(roll_even ^ sync_even)
                self.ypos = 0
                self.line = 0
                out.append(self.frame.copy())
            else:
                self.ypos += 2
                self.line += 1
        self.frames += out
        return out

    def _lock(self, disagree: bool) -> None:
        if disagree and self.vlock > 0:
            self.vlock -= 1
        elif not disagree and self.vlock < 20:
            self.vlock += 1


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
