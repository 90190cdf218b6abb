"""Small stream utilities: delay, volume, format conversions.

Parity with ``core/src/dsp/math/delay.h``, ``audio/volume.h`` and the
``convert/*.h`` helpers, as stateless/stateful array ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.block import StreamOp


class Delay(StreamOp):
    """Pure sample delay of D samples (``math/delay.h``).

    State: the last D input samples (zeros initially).
    """

    def __init__(self, delay: int, dtype=jnp.complex64):
        self.delay = int(delay)
        self.dtype = dtype

    def init_state(self):
        return np.zeros((self.delay,), np.dtype(self.dtype))

    def __call__(self, state, x):
        n = x.shape[-1]
        x = x.astype(self.dtype)
        state = jnp.broadcast_to(
            jnp.asarray(state), x.shape[:-1] + (self.delay,)
        )
        ext = jnp.concatenate([state, x], axis=-1)
        return ext[..., n:], ext[..., :n]


class Volume(StreamOp):
    """Gain + mute on audio (``audio/volume.h``)."""

    def __init__(self, level: float = 1.0, muted: bool = False):
        self.gain = np.float32(0.0 if muted else level)

    def init_state(self):
        return ()

    def __call__(self, state, x):
        return state, x * self.gain


def lr_to_stereo(l: jax.Array, r: jax.Array) -> jax.Array:
    """Stack L/R into (2, n) stereo (``convert/l_r_to_stereo.h``)."""
    return jnp.stack([l, r])


def mono_to_stereo(x: jax.Array) -> jax.Array:
    return jnp.stack([x, x])


def stereo_to_mono(x: jax.Array) -> jax.Array:
    return 0.5 * (x[0] + x[1])
