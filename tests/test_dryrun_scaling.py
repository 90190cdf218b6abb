"""Driver-contract dry run + weak-scaling smoke test on the virtual mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import __graft_entry__ as ge
from sdrtpu.graph.compile import complexify, realify
from sdrtpu.shard.channelizer import Channelizer
from sdrtpu.shard.mesh import make_mesh, shard_channel_state


def test_entry_compiles_and_runs():
    fn, args = ge.entry()
    out_state, audio = jax.jit(fn)(*args)
    a = np.asarray(audio)
    assert a.ndim == 3 and a.shape[0] == 2  # (2, C, n)
    assert np.isfinite(a).all()


def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)


def test_dryrun_multichip_2():
    ge.dryrun_multichip(2)


def test_predict_scaling_shape_and_floor():
    """The MULTICHIP artifact's scaling prediction (VERDICT r3 #4).

    The measured time is passed explicitly (the round-4 bench figure) so
    the assertion does not depend on an ambient SDRTPU_MEASURED_MS_PER_
    BLOCK override in the environment.
    """
    pred = ge.predict_scaling(measured_ms_per_block=0.0914)
    assert set(pred["per_n_hosts"]) == {"2", "4", "8"}
    for rec in pred["per_n_hosts"].values():
        assert 0 < rec["efficiency_strong"] <= 1.0
    # inputs must be present so the number is auditable
    assert pred["inputs"]["measured_ms_per_block"] > 0
    assert pred["inputs"]["halo_bytes_per_block"] > 0
    # the BASELINE bar: >=80% at N>=2 hosts
    assert pred["predicted_scaling_efficiency"] >= 0.8


def test_channel_weak_scaling_correctness():
    """Sharded 16-channel run == unsharded, with channel-parallel layout."""
    fs, out_sr = 2_400_000.0, 50000.0
    n = 12288
    centers = np.linspace(-1e6, 1e6, 16)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )
    ch = Channelizer(centers, fs, out_sr, block_len=n, method="xla")
    st0 = ch.init_state()
    _, ref = ch(st0, jnp.asarray(x))

    mesh = make_mesh(n_channel=8, n_time=1)
    st_sh = shard_channel_state(mesh, st0, 16)
    step = jax.jit(lambda s, a: ch(s, a))
    _, got = step(st_sh, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
