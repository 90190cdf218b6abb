"""Bit-level digital primitives (``core/src/dsp/digital/``).

All block-parallel: slicing and differential decoding are elementwise /
one-sample-shift operations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.block import StreamOp


def binary_slice(x: jax.Array) -> jax.Array:
    """float -> bit (``binary_slicer.h``): 1 where x > 0."""
    return (x > 0.0).astype(jnp.uint8)


class DifferentialDecoder(StreamOp):
    """Mod-N differential decode (``differential_decoder.h``):
    out[i] = (in[i] - in[i-1]) mod N, carrying the last symbol."""

    def __init__(self, modulus: int = 2):
        self.modulus = int(modulus)

    def init_state(self):
        return np.uint8(0)

    def __call__(self, state, x):
        prev = jnp.concatenate([jnp.asarray(state)[None], x[:-1]])
        out = jnp.mod(
            x.astype(jnp.int32) - prev.astype(jnp.int32) + self.modulus,
            self.modulus,
        ).astype(jnp.uint8)
        return x[-1], out


class ManchesterDecoder(StreamOp):
    """Take every other symbol (``manchester_decoder.h``): the reference
    simply decimates by 2 with a phase carry; block lengths must be even so
    the phase stays pinned."""

    def init_state(self):
        return ()

    def out_len(self, n: int) -> int:
        assert n % 2 == 0
        return n // 2

    def __call__(self, state, x):
        return state, x[..., ::2]
