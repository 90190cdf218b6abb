"""Jit-boundary compilation with real-planar complex handling.

The TPU PJRT backend in this environment supports complex arithmetic
*inside* compiled programs (XLA decomposes it onto the VPU/MXU) but cannot
transfer complex arrays across the host<->device boundary — neither as jit
inputs/outputs nor as eagerly created buffers.  This module provides the
boundary layer:

- `CplxPair(re, im)` — a pytree node holding a complex value as two real
  planes.  This is also simply the better TPU layout (planar I/Q).
- `realify(tree)` / `complexify(tree)` — lossless conversions applied at
  the jit boundary: complex leaves <-> CplxPair of float32.
- `CompiledOp` — wraps any `StreamOp` into a jitted step whose state and
  block I/O are fully real; internally the op still enjoys complex math.

Usage::

    op  = BroadcastFm(...)
    cop = CompiledOp(op)
    st  = cop.init_state()                  # real pytree (host numpy)
    st, y = cop(st, iq_block_complex_np)    # complex handled at boundary

Op `init_state()` implementations return host NumPy, so nothing touches the
device until the first compiled call.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class CplxPair(NamedTuple):
    """Complex value as planar (re, im) float32 — a pytree container."""

    re: Any
    im: Any


def _is_complex_leaf(x) -> bool:
    dt = getattr(x, "dtype", None)  # ndarray, jax.Array, or tracer
    if dt is not None:
        return np.issubdtype(dt, np.complexfloating)
    return isinstance(x, (complex, np.complexfloating))


def realify(tree):
    """Replace every complex leaf with a CplxPair of real arrays.

    Works on host NumPy (boundary prep) and on traced values (inside jit,
    just before returning).
    """

    def conv(x):
        if not _is_complex_leaf(x):
            return x
        if isinstance(x, (np.ndarray, np.complexfloating, complex)):
            xa = np.asarray(x)
            # np.array (not ascontiguousarray — it promotes 0-d to 1-d)
            return CplxPair(np.array(xa.real), np.array(xa.imag))
        return CplxPair(jnp.real(x), jnp.imag(x))  # device array or tracer

    return jax.tree_util.tree_map(conv, tree)


def complexify(tree):
    """Inverse of `realify`: CplxPair leaves -> complex arrays."""

    def conv(x):
        if isinstance(x, CplxPair):
            return jax.lax.complex(jnp.asarray(x.re), jnp.asarray(x.im))
        return x

    return jax.tree_util.tree_map(
        conv, tree, is_leaf=lambda x: isinstance(x, CplxPair)
    )


def to_numpy(tree):
    """Fetch a (real) pytree to host, re-joining CplxPair leaves."""

    def conv(x):
        if isinstance(x, CplxPair):
            return np.asarray(x.re) + 1j * np.asarray(x.im)
        return np.asarray(x)

    return jax.tree_util.tree_map(
        conv, tree, is_leaf=lambda x: isinstance(x, CplxPair)
    )


class CompiledOp:
    """Jit a StreamOp with real-only boundary state and I/O.

    The jitted step has signature ``(real_state, real_x) -> (real_state,
    real_y)``; ``__call__`` accepts complex or real host arrays and returns
    device arrays (CplxPair for complex outputs — use `to_numpy` to fetch).
    """

    def __init__(self, op, donate_state: bool = True):
        self.op = op

        def _step(rstate, rx):
            state = complexify(rstate)
            x = complexify(rx)
            state, y = op(state, x)
            return realify(state), realify(y)

        # donating the state argument lets XLA reuse its buffers for the
        # new state (halves resident memory for large filter-tail states)
        self._step = jax.jit(
            _step, donate_argnums=(0,) if donate_state else ()
        )

    def init_state(self):
        return realify(self.op.init_state())

    def __call__(self, rstate, x):
        return self._step(rstate, realify(x))
