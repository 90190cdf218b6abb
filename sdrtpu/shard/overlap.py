"""Overlap-save halo exchange for time-axis sharding.

The reference carries FIR history across work blocks with a ``memmove``
(``core/src/dsp/filter/fir.h:80``).  When the time axis is sharded across
devices, that history is the *halo*: each shard needs the last ``taps-1``
samples of its left neighbor.  We exchange it with `lax.ppermute` over the
mesh's ``time`` axis — the direct ICI analog of the reference's in-process
tail copy (SURVEY §5.7).

The global stream tail (from the previous block of the whole stream) is
injected into time-shard 0; the new global tail is the last shard's tail,
extracted after the shard_map.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..kernels.fir import correlate_valid


def halo_exchange_left(x_local: jax.Array, halo_len: int, axis_name: str):
    """Give each time shard its left neighbor's trailing ``halo_len`` samples.

    Shard 0 receives zeros (matching a fresh stream's zero history).
    """
    n_dev = jax.lax.axis_size(axis_name)
    tail = x_local[..., -halo_len:]
    perm = [(i, i + 1) for i in range(n_dev - 1)]
    return jax.lax.ppermute(tail, axis_name, perm)


def time_sharded_fir(
    mesh: Mesh,
    taps,
    x: jax.Array,
    global_tail: jax.Array,
    axis_name: str = "time",
):
    """Streaming FIR over a time-sharded block.

    ``x``: (n,) sharded along ``axis_name``; ``global_tail``: (taps-1,)
    carried from the previous stream block (replicated).  Returns
    (new_global_tail, y) with y sharded like x.
    """
    ntaps = len(taps)
    halo = ntaps - 1

    def f(tail_rep, x_local):
        idx = jax.lax.axis_index(axis_name)
        left = halo_exchange_left(x_local, halo, axis_name)
        left = jnp.where(idx == 0, tail_rep, left)
        ext = jnp.concatenate([left, x_local], axis=-1)
        y_local = correlate_valid(ext, taps)
        # new global tail: only the last shard's tail survives the psum
        n_dev = jax.lax.axis_size(axis_name)
        contrib = jnp.where(idx == n_dev - 1, x_local[..., -halo:], 0.0)
        new_tail = jax.lax.psum(contrib, axis_name)
        return new_tail, y_local

    fn = shard_map(
        f,
        mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=(P(), P(axis_name)),
    )
    return fn(global_tail, x)
