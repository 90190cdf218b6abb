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


def test_bare_path_roundtrips(tmp_path):
    """Paths without a .npz suffix must save and load (np.savez appends
    '.npz' to bare string paths; save_state writes via a handle)."""
    d = BroadcastFm(samplerate=250000.0, stereo=True)
    st = realify(d.init_state())
    path = str(tmp_path / "rx.state")  # no .npz
    save_state(path, st)
    import os

    assert os.path.exists(path)
    restored = load_state(path, st)
    for a, b in zip(*(map(lambda s: __import__("jax").tree_util.tree_leaves(s),
                          (st, restored)))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_treedef_mismatch_detected(tmp_path):
    import pytest

    d1 = BroadcastFm(samplerate=250000.0, stereo=True)
    d2 = BroadcastFm(samplerate=250000.0, stereo=True, rds_out=True)
    path = str(tmp_path / "s.npz")
    save_state(path, realify(d1.init_state()))
    with pytest.raises(ValueError):
        load_state(path, realify(d2.init_state()))


class TestReceiverCheckpoint:
    def test_mid_stream_resume_bit_exact(self, tmp_path):
        """Snapshot a receiver mid-stream, restore into a FRESH receiver,
        continue — outputs must equal the uninterrupted run exactly."""
        import numpy as np

        from sdrtpu.apps.receiver import IQFrontend, Receiver, VfoConfig

        fs = 400000.0
        n_blocks = 6
        t = np.arange(0)  # noqa: F841

        def make_rx(sink):
            fe = IQFrontend(fs, {"v0": VfoConfig(50000.0, "nfm")},
                            spectrum=False)
            return Receiver(fe, block_len=fe.block_multiple(),
                            audio_sinks={"v0": sink})

        rng = np.random.default_rng(2)
        probe = make_rx(lambda a: None)
        n = n_blocks * probe.block_len + 137  # non-multiple: framer carry
        tt = np.arange(n) / fs
        iq = (0.4 * np.exp(1j * (2 * np.pi * 50000.0 * tt
              + np.cumsum(2 * np.pi * 2500.0
                          * np.sin(2 * np.pi * 700.0 * tt) / fs)))
              ).astype(np.complex64)
        half = n // 2

        ref_out = []
        rx = make_rx(ref_out.append)
        rx.push(iq)
        rx.flush()
        ref = np.concatenate(ref_out, axis=-1)

        out1 = []
        rx1 = make_rx(out1.append)
        rx1.push(iq[:half])
        ckpt = str(tmp_path / "rx.npz")
        rx1.save_checkpoint(ckpt)

        out2 = []
        rx2 = make_rx(out2.append)  # fresh process stand-in
        rx2.load_checkpoint(ckpt)
        rx2.push(iq[half:])
        rx2.flush()
        got = np.concatenate(out1 + out2, axis=-1)
        np.testing.assert_array_equal(got, ref)

    def test_scan_batch_resume_loses_nothing(self, tmp_path):
        """With scan_batch > 1 a snapshot must also capture the framed-
        but-not-yet-dispatched pending blocks: cut at a point where
        blocks are sitting in the batch queue, resume in a fresh
        receiver, and require the full-length output."""
        import numpy as np

        from sdrtpu.apps.receiver import IQFrontend, Receiver, VfoConfig

        fs = 400000.0

        def make_rx(sink, batch):
            fe = IQFrontend(fs, {"v0": VfoConfig(50000.0, "nfm")},
                            spectrum=False)
            return Receiver(fe, block_len=fe.block_multiple(),
                            audio_sinks={"v0": sink}, scan_batch=batch)

        probe = make_rx(lambda a: None, 1)
        blk = probe.block_len
        n = 11 * blk + 77
        tt = np.arange(n) / fs
        iq = (0.4 * np.exp(1j * (2 * np.pi * 50000.0 * tt
              + np.cumsum(2 * np.pi * 2500.0
                          * np.sin(2 * np.pi * 700.0 * tt) / fs)))
              ).astype(np.complex64)

        ref_out = []
        rx = make_rx(ref_out.append, 1)
        rx.push(iq)
        rx.flush()
        ref = np.concatenate(ref_out, axis=-1)

        # cut mid-batch: after 6 blocks + a tail, blocks 5..6 are queued
        # in _pending (block 1 single-dispatched, blocks 2-5 batched)
        out1 = []
        rx1 = make_rx(out1.append, 4)
        half = 6 * blk + 33
        rx1.push(iq[:half])
        assert rx1._pending, "test must cut with blocks in the batch queue"
        ckpt = str(tmp_path / "rx.npz")
        rx1.save_checkpoint(ckpt)

        out2 = []
        rx2 = make_rx(out2.append, 4)
        rx2.load_checkpoint(ckpt)
        rx2.push(iq[half:])
        rx2.flush()
        got = np.concatenate(out1 + out2, axis=-1)
        assert got.shape == ref.shape, (got.shape, ref.shape)
        np.testing.assert_allclose(got, ref, atol=1e-5)
