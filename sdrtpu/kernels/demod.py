"""Analog demodulators — block-parallel reformulations.

FM quadrature discrimination in the reference carries the previous sample's
phase through a per-sample loop (``core/src/dsp/demod/quadrature.h:39-46``).
The phase *difference* is order-free:

    d[n] = angle(x[n] * conj(x[n-1])) / (2*pi*deviation/fs)

so on TPU it is one shifted multiply + atan2 across the whole block; the
only carry is the last input sample.  We use exact atan2 where the reference
uses a fast polynomial approximation (``math/fast_atan2.h``) — strictly more
accurate, identical semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.block import StreamOp
from .taps import hz_to_rads


class Quadrature(StreamOp):
    """FM discriminator (``demod/quadrature.h``).

    Output is the per-sample phase increment scaled by 1/(2*pi*dev/fs), so a
    tone at +deviation Hz demodulates to +1.0.
    State: previous complex sample (init 1+0j == initial phase 0, matching
    the reference's ``phase = 0.0f`` start).
    """

    def __init__(self, deviation_hz: float, samplerate: float,
                 channel_derotate: bool = False):
        self.inv_deviation = np.float32(1.0 / hz_to_rads(deviation_hz, samplerate))
        # channel_derotate: the discriminator is rotation-transparent —
        # a residual carrier e^{j w n} on the input only adds the
        # CONSTANT phase w to each product sample, so a DDC's residual
        # rotator can be skipped entirely and compensated here by one
        # per-channel constant complex multiply on the product (exact
        # algebra, no wrap concerns, no MPX DC offset).  The (C,) "rot"
        # angle lives in state so retunes swap it without retrace
        # (round-5 analysis, docs/ROUND5.md headroom #1).
        self.channel_derotate = bool(channel_derotate)

    def init_state(self):
        if self.channel_derotate:
            # owner (the pipeline) seeds "rot" with the per-channel
            # residual angular rate; scalar 0 broadcasts until then
            return {"prev": np.ones((), np.complex64),
                    "rot": np.zeros((), np.float32)}
        return np.ones((), np.complex64)

    def __call__(self, state, x):
        if self.channel_derotate:
            prev, rot = state["prev"], jnp.asarray(state["rot"])
            prevb = jnp.broadcast_to(jnp.asarray(prev), x.shape[:-1])
            ext = jnp.concatenate([prevb[..., None], x], axis=-1)
            d = ext[..., 1:] * jnp.conj(ext[..., :-1])
            comp = jax.lax.complex(jnp.cos(rot), jnp.sin(rot))
            d = d * comp[..., None]
            y = jnp.arctan2(d.imag, d.real) * self.inv_deviation
            return {"prev": x[..., -1], "rot": state["rot"]}, y
        state = jnp.broadcast_to(jnp.asarray(state), x.shape[:-1])
        ext = jnp.concatenate([state[..., None], x], axis=-1)
        d = ext[..., 1:] * jnp.conj(ext[..., :-1])
        y = jnp.arctan2(d.imag, d.real) * self.inv_deviation
        return x[..., -1], y


def complex_to_real(x: jax.Array) -> jax.Array:
    """``convert::ComplexToReal`` — take the real part."""
    return x.real


def real_to_complex(x: jax.Array) -> jax.Array:
    """``convert::RealToComplex`` — zero imaginary part."""
    return x.astype(jnp.complex64)
