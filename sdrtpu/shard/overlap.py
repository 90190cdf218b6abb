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

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..kernels.fir import correlate_valid

_TWO_PI = 2.0 * np.pi


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


def time_sharded_relock(
    mesh: Mesh,
    op,
    x: jax.Array,
    x_tail: jax.Array,
    relock: int,
    axis_name: str = "time",
    out_spec=None,
):
    """Time-shard a SEQUENTIAL-carry StreamOp via prefix relock.

    Feedback loops (PLL/AGC/deemphasis/clock recovery) carry state that
    cannot be split exactly across time shards (SURVEY §7 "hard part").
    Prefix relock is overlap-save for nonlinear loops: EVERY shard runs
    the op from a reset state over [relock-sample prefix ++ local span]
    and discards the prefix outputs — the loops re-acquire on the prefix,
    so only the residual acquisition error after ``relock`` samples
    survives.  Prefixes come from the left neighbor via `ppermute`;
    shard 0 uses the carried ``x_tail`` (the previous global block's
    trailing input samples; zeros for a fresh stream).  No op state
    crosses shard or block boundaries — the only carried value is the
    input tail, which keeps the scheme deterministic regardless of shard
    count.

    For the WFM chain (pilot PLL bw 25000/fs, 317-tap pilot FIR), a few
    thousand prefix samples put the residual ~40 dB under the audio
    (tests/test_shard.py::TestPrefixRelock).  This is the single-channel
    time-scaling escape hatch; carry-free chains should use exact halo
    exchange (`time_sharded_fir` / `time_sharded_channelizer`) instead.

    ``op`` must be rate-preserving (out_len(n) == n).  Returns
    ``(new_x_tail, y)`` with ``y`` sharded like ``x``; for outputs whose
    time axis is not the first (e.g. (2, n) stereo) pass ``out_spec``
    (e.g. ``P(None, "time")``, a pytree prefix over the op's output).
    """

    def f(tail_rep, x_local):
        idx = jax.lax.axis_index(axis_name)
        n_dev = jax.lax.axis_size(axis_name)
        left = halo_exchange_left(x_local, relock, axis_name)
        left = jnp.where(idx == 0, tail_rep, left)
        ext = jnp.concatenate([left, x_local], axis=-1)
        # seed the reset state with a varying zero so lax.scan carries
        # inside the op typecheck under shard_map's manual axes
        v0 = jnp.real(ext[..., 0]) * 0
        st0 = jax.tree_util.tree_map(
            lambda l: jnp.asarray(l) + v0.astype(jnp.asarray(l).dtype),
            op.init_state(),
        )
        _, y = op(st0, ext)
        y = jax.tree_util.tree_map(lambda a: a[..., relock:], y)
        contrib = jnp.where(
            idx == n_dev - 1,
            x_local[..., -relock:],
            jnp.zeros_like(x_local[..., -relock:]),
        )
        new_tail = jax.lax.psum(contrib, axis_name)
        return new_tail, y

    fn = shard_map(
        f,
        mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=(P(), out_spec if out_spec is not None else P(axis_name)),
    )
    return fn(x_tail, x)


def time_sharded_channelizer(
    mesh: Mesh,
    chain,
    x: jax.Array,
    state,
    axis_name: str = "time",
):
    """Run an `FftDecimatorChain` with its time axis sharded over ``mesh``.

    ``chain`` must be built with ``block_len = N / n_time`` (each shard's
    local span); ``x`` is the (N,) global wideband block, sharded along
    ``axis_name``; ``state`` is the chain's (replicated) state from
    ``chain.init_state()`` or a previous call.

    Two things cross shard boundaries:

    - the convolution halo: each shard needs the previous shard's last
      ``tpad - 1`` input samples (`ppermute`, the ICI analog of the
      reference's ``memmove``d FIR history — SURVEY §5.7); shard 0 uses
      the carried global stream tail;
    - the residual IF-rate rotator phase: shard ``s`` starts
      ``s * block_len`` input samples into the global block, so its
      per-channel phase is ``phase + s * delta (mod 2pi)`` where ``delta``
      is the chain rotator's per-local-block phase advance — computed
      locally from `axis_index`, no communication.

    Returns ``(new_state, y)`` with ``y`` (C, N/R) sharded along its time
    axis and ``new_state`` replicated (tail = last shard's input tail,
    phase advanced by the whole global block).

    On a 2-D mesh whose "channel" axis has size > 1 (auto-detected from
    ``mesh.axis_names``), every per-channel state leaf — the folded
    filter table ``hf``, rotator phase/tables — and the output's channel
    axis are additionally sharded over it, so a ("channel", "time") mesh
    splits both the VFO set and the wideband span; the only cross-device
    traffic is the time-axis halo.
    """
    halo = chain.tpad - 1
    C = chain.n_channels

    def f(tail_rep, rot_phase, x_local, st_rest):
        idx = jax.lax.axis_index(axis_name)
        n_dev = jax.lax.axis_size(axis_name)
        left = halo_exchange_left(x_local, halo, axis_name)
        left = jnp.where(idx == 0, tail_rep, left)
        delta = jnp.asarray(st_rest["rot"]["delta"])  # (C,) per local block
        local_rot = dict(st_rest["rot"])
        local_rot["phase"] = jnp.mod(
            rot_phase + idx.astype(jnp.float32) * delta, np.float32(_TWO_PI)
        )
        st = dict(st_rest)
        st["tail"] = left
        st["rot"] = local_rot
        _, y = chain(st, x_local)
        contrib = jnp.where(
            idx == n_dev - 1, x_local[..., -halo:], jnp.zeros_like(x_local[..., -halo:])
        )
        new_tail = jax.lax.psum(contrib, axis_name)
        new_phase = jnp.mod(
            rot_phase + n_dev * delta, np.float32(_TWO_PI)
        )
        return new_tail, new_phase, y

    st_rest = {k: v for k, v in state.items() if k != "tail"}
    rot_phase = jnp.asarray(state["rot"]["phase"])

    channel_axis = "channel" if "channel" in mesh.axis_names and (
        mesh.shape.get("channel", 1) > 1
    ) else None

    def chan_spec(leaf):
        arr = np.asarray(leaf) if not hasattr(leaf, "shape") else leaf
        if channel_axis and getattr(arr, "ndim", 0) >= 1 and arr.shape[0] == C:
            return P(channel_axis)
        return P()

    rest_specs = jax.tree_util.tree_map(chan_spec, st_rest)
    phase_spec = chan_spec(rot_phase)
    y_spec = P(channel_axis, axis_name) if channel_axis else P(None, axis_name)
    fn = shard_map(
        f,
        mesh=mesh,
        in_specs=(P(), phase_spec, P(axis_name), rest_specs),
        out_specs=(P(), phase_spec, y_spec),
    )
    new_tail, new_phase, y = fn(
        jnp.asarray(state["tail"]), rot_phase, x, st_rest
    )
    new_state = dict(state)
    new_state["tail"] = new_tail
    new_rot = dict(state["rot"])
    new_rot["phase"] = new_phase
    new_state["rot"] = new_rot
    return new_state, y
