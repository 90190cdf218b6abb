"""Checkpoint/resume: snapshot a streaming chain mid-stream, restore, and
verify bit-exact continuation."""

import numpy as np
import jax.numpy as jnp

from sdrtpu.graph.checkpoint import load_state, save_state
from sdrtpu.graph.compile import realify, complexify
from sdrtpu.kernels.wfm import BroadcastFm


def test_mid_stream_resume(tmp_path):
    fs = 250000.0
    rng = np.random.default_rng(2)
    iq = np.exp(1j * np.cumsum(0.3 * rng.standard_normal(1 << 15))).astype(
        np.complex64
    )
    d = BroadcastFm(samplerate=fs, stereo=True, pilot_mode="normalized")

    st = d.init_state()
    st, _ = d(st, jnp.asarray(iq[:16384]))

    path = str(tmp_path / "state.npz")
    save_state(path, realify(st))
    restored = complexify(load_state(path, realify(st)))

    st_a, (out_a, _) = d(st, jnp.asarray(iq[16384:]))
    st_b, (out_b, _) = d(restored, jnp.asarray(iq[16384:]))
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


def test_treedef_mismatch_detected(tmp_path):
    import pytest

    d1 = BroadcastFm(samplerate=250000.0, stereo=True)
    d2 = BroadcastFm(samplerate=250000.0, stereo=True, rds_out=True)
    path = str(tmp_path / "s.npz")
    save_state(path, realify(d1.init_state()))
    with pytest.raises(ValueError):
        load_state(path, realify(d2.init_state()))
