"""CTCSS sub-audible tone squelch/decoder.

Reimplements ``dsp::noise_reduction::CTCSSSquelch``
(``core/src/dsp/noise_reduction/ctcss_squelch.h``): the stereo audio is
reinterpreted as complex (L + jR), down-converted by 160.55 Hz and
resampled to 500 S/s with a 200 Hz channel filter, FM-discriminated
(deviation 1 Hz => output is instantaneous frequency offset in Hz), then a
running mean/variance with a Schmitt trigger on the variance decides
whether a stable tone is present; the mean maps to the nearest of the 51
standard CTCSS tones.

TPU mapping: the mean/variance one-poles are linear recurrences
(associative scans); the Schmitt/tone state machine runs as a tiny
`lax.scan` at 500 S/s (~50 steps per 100 ms block).  The audio gate is
applied block-granular from the final mute state — the reference also
gates whole work blocks (``ctcss_squelch.h:268-274``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.block import StreamOp
from .demod import Quadrature
from .iir import first_order_recurrence
from .mixer import FreqXlator
from .resample import RationalResampler

DECODE_SAMPLERATE = 500.0
DECODE_OFFSET = 160.55

# The 51 standard CTCSS tone frequencies (Hz).
CTCSS_TONES = np.array([
    67.0, 69.3, 71.9, 74.4, 77.0, 79.7, 82.5, 85.4, 88.5, 91.5,
    94.8, 97.4, 100.0, 103.5, 107.2, 110.9, 114.8, 118.8, 123.0, 127.3,
    131.8, 136.5, 141.3, 146.2, 150.0, 151.4, 156.7, 159.8, 162.2, 165.5,
    167.9, 171.3, 173.8, 177.3, 179.9, 183.5, 186.2, 189.9, 192.8, 196.6,
    199.5, 203.5, 206.5, 210.7, 218.1, 225.7, 229.1, 233.6, 241.8, 250.3,
    254.1,
], dtype=np.float32)

TONE_ANY = -2
TONE_NONE = -1


class CtcssSquelch(StreamOp):
    """Stereo audio gate keyed on a required CTCSS tone.

    ``required_tone``: TONE_NONE (decode only, audio always passes),
    TONE_ANY (any valid tone opens), or an index into `CTCSS_TONES`.
    Output: (gated_audio, detected_tone_index) — the detector state is in
    the state pytree and readable host-side for UIs.
    """

    def __init__(self, samplerate: float, required_tone: int = TONE_NONE):
        self.samplerate = float(samplerate)
        self.required_tone = int(required_tone)
        self.xlator = FreqXlator(-DECODE_OFFSET, samplerate)
        self.ddc = RationalResampler(samplerate, DECODE_SAMPLERATE)
        self.quad = Quadrature(1.0, DECODE_SAMPLERATE)

    def block_multiple(self) -> int:
        return self.ddc.block_multiple()

    def init_state(self):
        return {
            "xl": self.xlator.init_state(),
            "ddc": self.ddc.init_state(),
            "quad": self.quad.init_state(),
            "mean": np.float32(0.0),
            "var": np.float32(1e6),  # start noisy -> muted
            "var_ok": np.asarray(False),
            "mute": np.asarray(True),
            "tone": np.int32(TONE_NONE),
            "min_freq": np.float32(0.0),
            "max_freq": np.float32(0.0),
        }

    def _detector_scan(self, carry, freqs):
        tones = jnp.asarray(CTCSS_TONES)

        def step(c, val):
            mean, var, var_ok, mute, tone, fmin, fmax = c
            mean = 0.95 * mean + 0.05 * val
            err = val - mean
            var = 0.95 * var + 0.05 * err * err
            nvar_ok = jnp.where(var_ok, var < 1100.0, var < 1000.0)

            rematch = nvar_ok & (~var_ok | (mean < fmin) | (mean > fmax))
            freq = mean + np.float32(DECODE_OFFSET)
            in_range = (freq >= tones[0] - 2.5) & (freq <= tones[-1] + 2.5)
            nearest = jnp.argmin(jnp.abs(tones - freq)).astype(jnp.int32)
            new_tone = jnp.where(in_range, nearest, jnp.int32(TONE_NONE))

            tone = jnp.where(rematch, new_tone, tone)
            rt = self.required_tone
            new_mute = ~(
                (tone == rt) | ((tone != TONE_NONE) & (rt == TONE_ANY))
            )
            mute = jnp.where(rematch, new_mute, mute)

            # hysteresis band: halfway to the neighboring tones
            ti = jnp.clip(tone, 0, len(CTCSS_TONES) - 1)
            c0 = tones[ti]
            left = jnp.where(ti > 0, tones[jnp.maximum(ti - 1, 0)], c0 - 2.5)
            right = jnp.where(
                ti < len(CTCSS_TONES) - 1,
                tones[jnp.minimum(ti + 1, len(CTCSS_TONES) - 1)],
                c0 + 2.5,
            )
            valid = rematch & (tone != TONE_NONE)
            fmin = jnp.where(valid, (left + c0) / 2.0 - np.float32(DECODE_OFFSET), fmin)
            fmax = jnp.where(valid, (right + c0) / 2.0 - np.float32(DECODE_OFFSET), fmax)

            # falling edge of variance-ok -> mute
            edge = ~nvar_ok & var_ok
            mute = jnp.where(edge, True, mute)
            tone = jnp.where(edge, jnp.int32(TONE_NONE), tone)
            return (mean, var, nvar_ok, mute, tone, fmin, fmax), None

        return jax.lax.scan(step, carry, freqs)

    def __call__(self, state, audio):
        """audio: (2, n) float32 stereo at ``samplerate``."""
        st = dict(state)
        z = jax.lax.complex(audio[0], audio[1])
        st["xl"], z = self.xlator(state["xl"], z)
        st["ddc"], z = self.ddc(state["ddc"], z)
        st["quad"], freqs = self.quad(state["quad"], z)

        carry = (
            jnp.asarray(state["mean"]),
            jnp.asarray(state["var"]),
            jnp.asarray(state["var_ok"]),
            jnp.asarray(state["mute"]),
            jnp.asarray(state["tone"]),
            jnp.asarray(state["min_freq"]),
            jnp.asarray(state["max_freq"]),
        )
        carry, _ = self._detector_scan(carry, freqs)
        (st["mean"], st["var"], st["var_ok"], st["mute"], st["tone"],
         st["min_freq"], st["max_freq"]) = carry

        gate_active = self.required_tone != TONE_NONE
        out = jnp.where(gate_active & carry[3], 0.0, audio)
        return st, (out, carry[4])
