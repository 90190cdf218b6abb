"""Fused Pallas channelizer kernel vs the unfused reference ops."""

import numpy as np
import jax.numpy as jnp
import pytest

from sdrtpu.kernels.fir import DecimatingFir
from sdrtpu.kernels.pallas_channelizer import TILE_IN, FusedChannelizerStage
from sdrtpu.shard.channelizer import MultiVfoMixer

RNG = np.random.default_rng(5)


def make_taps(t=36):
    h = RNG.standard_normal(t).astype(np.float32)
    return h / np.abs(h).sum()


@pytest.mark.parametrize("decim", [8, 4])
def test_fused_matches_unfused(decim):
    fs = 10e6
    n = TILE_IN  # one tile
    offsets = np.array([-3e6, -1e6, 0.5e6, 2.75e6])
    taps = make_taps(36 if decim == 8 else 20)
    x = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)).astype(
        np.complex64
    )

    fused = FusedChannelizerStage(offsets, fs, taps, decim, n, interpret=True)
    st = fused.init_state()
    st, y = fused(st, jnp.asarray(x))
    y = np.asarray(y)

    mixer = MultiVfoMixer([-f for f in offsets], fs, n)
    dec = DecimatingFir(taps, decim)
    mst, mixed = mixer(mixer.init_state(), jnp.asarray(x))
    dst = np.zeros((len(offsets), dec.ntaps - 1), np.complex64)
    dst, ref = dec(dst, mixed)
    ref = np.asarray(ref)

    assert y.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(y, ref, atol=2e-3 * scale)


def test_streaming_chunks_match():
    fs = 10e6
    n = TILE_IN
    offsets = np.array([1.5e6, -2.5e6])
    taps = make_taps(36)
    x = (RNG.standard_normal(2 * n) + 1j * RNG.standard_normal(2 * n)).astype(
        np.complex64
    )
    fused = FusedChannelizerStage(offsets, fs, taps, 8, n, interpret=True)
    st = fused.init_state()
    st, y1 = fused(st, jnp.asarray(x[:n]))
    st, y2 = fused(st, jnp.asarray(x[n:]))
    got = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=-1)

    mixer = MultiVfoMixer([-f for f in offsets], fs, 2 * n)
    dec = DecimatingFir(taps, 8)
    mst, mixed = mixer(mixer.init_state(), jnp.asarray(x))
    dst = np.zeros((2, dec.ntaps - 1), np.complex64)
    dst, ref = dec(dst, mixed)
    ref = np.asarray(ref)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=2e-3 * scale)


def test_non_tile_aligned_block():
    fs = 10e6
    n = TILE_IN + 40000  # not a tile multiple; divisible by 8
    offsets = np.array([0.9e6, -1.1e6])
    taps = make_taps(36)
    x = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)).astype(np.complex64)
    fused = FusedChannelizerStage(offsets, fs, taps, 8, n, interpret=True)
    st, y = fused(fused.init_state(), jnp.asarray(x))
    y = np.asarray(y)
    mixer = MultiVfoMixer([-f for f in offsets], fs, n)
    dec = DecimatingFir(taps, 8)
    _, mixed = mixer(mixer.init_state(), jnp.asarray(x))
    _, ref = dec(np.zeros((2, dec.ntaps - 1), np.complex64), mixed)
    ref = np.asarray(ref)
    assert y.shape == ref.shape
    np.testing.assert_allclose(y, ref, atol=2e-3 * np.abs(ref).max())


class TestModulatedDecimator:
    """xla-fused stage (modulated taps) vs the unfused reference ops."""

    @pytest.mark.parametrize("decim", [8, 5, 2])
    def test_matches_unfused(self, decim):
        from sdrtpu.shard.channelizer import ModulatedDecimatorStage

        fs = 10e6
        n = 4000
        offsets = np.array([-3e6, -1e6, 0.5e6, 2.75e6])
        taps = make_taps(36)
        x = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)).astype(
            np.complex64
        )

        stage = ModulatedDecimatorStage(offsets, fs, taps, decim, n)
        st = stage.init_state()
        st, y = stage(st, jnp.asarray(x))
        y = np.asarray(y)

        mixer = MultiVfoMixer([-f for f in offsets], fs, n)
        dec = DecimatingFir(taps, decim)
        mst, mixed = mixer(mixer.init_state(), jnp.asarray(x))
        dst = np.zeros((len(offsets), dec.ntaps - 1), np.complex64)
        dst, ref = dec(dst, mixed)
        ref = np.asarray(ref)

        assert y.shape == ref.shape
        scale = np.abs(ref).max()
        np.testing.assert_allclose(y, ref, atol=2e-3 * scale)

    def test_streaming_chunks_match(self):
        from sdrtpu.shard.channelizer import ModulatedDecimatorStage

        fs = 10e6
        n = 4000
        offsets = np.array([1.5e6, -2.5e6])
        taps = make_taps(36)
        x = (
            RNG.standard_normal(2 * n) + 1j * RNG.standard_normal(2 * n)
        ).astype(np.complex64)
        stage = ModulatedDecimatorStage(offsets, fs, taps, 8, n)
        st = stage.init_state()
        st, y1 = stage(st, jnp.asarray(x[:n]))
        st, y2 = stage(st, jnp.asarray(x[n:]))
        got = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=-1)

        mixer = MultiVfoMixer([-f for f in offsets], fs, 2 * n)
        dec = DecimatingFir(taps, 8)
        mst, mixed = mixer(mixer.init_state(), jnp.asarray(x))
        dst = np.zeros((len(offsets), dec.ntaps - 1), np.complex64)
        dst, ref = dec(dst, mixed)
        ref = np.asarray(ref)
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got, ref, atol=2e-3 * scale)

    def test_full_channelizer_paths_agree(self):
        from sdrtpu.shard.channelizer import Channelizer

        fs, f_if = 2_000_000.0, 250_000.0
        offsets = np.array([-700e3, 0.0, 412e3])
        cz_ref = Channelizer(offsets, fs, f_if, 16000, method="xla")
        cz_new = Channelizer(offsets, fs, f_if, 16000, method="xla-fused")
        assert cz_new.method == "xla-fused"
        x = (
            RNG.standard_normal(32000) + 1j * RNG.standard_normal(32000)
        ).astype(np.complex64)
        sr, sn = cz_ref.init_state(), cz_new.init_state()
        outs_r, outs_n = [], []
        for blk in x.reshape(2, 16000):
            sr, yr = cz_ref(sr, jnp.asarray(blk))
            sn, yn = cz_new(sn, jnp.asarray(blk))
            outs_r.append(np.asarray(yr))
            outs_n.append(np.asarray(yn))
        ref = np.concatenate(outs_r, axis=-1)
        got = np.concatenate(outs_n, axis=-1)
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got, ref, atol=2e-3 * scale)

    def test_multistage_chain_matches_unfused_streaming(self):
        from sdrtpu.shard.channelizer import Channelizer

        fs, f_if = 10_000_000.0, 250_000.0  # ratio 40 -> stages [8, 5]
        offsets = np.array([-4e6, -1.3e6, 0.0, 2.2e6, 3.9e6])
        n = 40_000
        cz_ref = Channelizer(offsets, fs, f_if, n, method="xla")
        cz_new = Channelizer(offsets, fs, f_if, n, method="xla-fused")
        assert len(cz_new.fused.stage_plan) == 2
        x = (
            RNG.standard_normal(3 * n) + 1j * RNG.standard_normal(3 * n)
        ).astype(np.complex64)
        sr, sn = cz_ref.init_state(), cz_new.init_state()
        outs_r, outs_n = [], []
        for blk in x.reshape(3, n):
            sr, yr = cz_ref(sr, jnp.asarray(blk))
            sn, yn = cz_new(sn, jnp.asarray(blk))
            outs_r.append(np.asarray(yr))
            outs_n.append(np.asarray(yn))
        ref = np.concatenate(outs_r, axis=-1)
        got = np.concatenate(outs_n, axis=-1)
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got, ref, atol=3e-3 * scale)


class TestFftDecimator:
    """Frequency-domain channelizer front vs the time-domain modulated chain."""

    def test_matches_modulated_chain_two_stage(self):
        from sdrtpu.shard.channelizer import (
            FftDecimatorChain,
            ModulatedDecimatorChain,
        )

        fs = 10e6
        n = 40000
        offsets = np.array([-3e6, -1e6, 0.5e6, 2.75e6])
        stages = [(make_taps(36), 8), (make_taps(95), 5)]
        x = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)).astype(
            np.complex64
        )

        ref_op = ModulatedDecimatorChain(offsets, fs, stages, n)
        st, ref = ref_op(ref_op.init_state(), jnp.asarray(x))
        ref = np.asarray(ref)

        fft_op = FftDecimatorChain(offsets, fs, stages, n)
        st2, got = fft_op(fft_op.init_state(), jnp.asarray(x))
        got = np.asarray(got)

        assert got.shape == ref.shape
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got, ref, atol=4e-3 * scale)

    def test_streaming_chunks_match_full(self):
        from sdrtpu.shard.channelizer import FftDecimatorChain

        fs = 10e6
        n = 40000
        offsets = np.array([1.5e6, -2.5e6])
        stages = [(make_taps(36), 8), (make_taps(95), 5)]
        x = (
            RNG.standard_normal(2 * n) + 1j * RNG.standard_normal(2 * n)
        ).astype(np.complex64)

        big = FftDecimatorChain(offsets, fs, stages, 2 * n)
        st, full = big(big.init_state(), jnp.asarray(x))
        full = np.asarray(full)

        sm = FftDecimatorChain(offsets, fs, stages, n)
        st = sm.init_state()
        st, y1 = sm(st, jnp.asarray(x[:n]))
        st, y2 = sm(st, jnp.asarray(x[n:]))
        got = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=-1)
        scale = np.abs(full).max()
        np.testing.assert_allclose(got, full, atol=4e-3 * scale)

    def test_full_channelizer_fft_method(self):
        from sdrtpu.shard.channelizer import Channelizer

        fs, f_if = 10_000_000.0, 250_000.0
        offsets = np.array([-4e6, -1.2e6, 2e6])
        n = 40000
        cz_ref = Channelizer(offsets, fs, f_if, n, method="xla-fused")
        cz_fft = Channelizer(offsets, fs, f_if, n, method="fft")
        assert cz_fft.method == "fft"
        x = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)).astype(
            np.complex64
        )
        _, ref = cz_ref(cz_ref.init_state(), jnp.asarray(x))
        _, got = cz_fft(cz_fft.init_state(), jnp.asarray(x))
        ref, got = np.asarray(ref), np.asarray(got)
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got, ref, atol=4e-3 * scale)

    def test_sparse_fold_matches_dense(self):
        """The -100 dB sparse alias-fold is numerically the dense fold.

        Needs real (lowpass-designed) cascade taps: with random taps every
        alias row carries energy and the sparse path correctly disables
        itself (checked at the end).
        """
        from sdrtpu.kernels.resample import RationalResampler
        from sdrtpu.shard.channelizer import FftDecimatorChain

        fs = 10e6
        n = 40000
        # include edge offsets whose alias rows wrap around DC/Nyquist
        offsets = np.array([-4.9e6, -2.2e6, 0.0, 1e5, 3.3e6, 4.9e6])
        rr = RationalResampler(fs, 250e3)
        stages = [
            (np.asarray(s.taps), s.decimation) for s in rr.predecim.stages
        ]
        x = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)).astype(
            np.complex64
        )
        sparse = FftDecimatorChain(offsets, fs, stages, n,
                                   sparse_thresh_db=-100.0)
        dense = FftDecimatorChain(offsets, fs, stages, n)
        assert sparse._sparse and not dense._sparse
        assert sparse.rk < sparse.ratio // 2
        _, a = sparse(sparse.init_state(), jnp.asarray(x))
        _, b = dense(dense.init_state(), jnp.asarray(x))
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max()
        np.testing.assert_allclose(a, b, atol=2e-4 * scale)

    def test_random_taps_disable_sparse(self):
        from sdrtpu.shard.channelizer import FftDecimatorChain

        fs, n = 10e6, 40000
        stages = [(make_taps(36), 8), (make_taps(95), 5)]
        ch = FftDecimatorChain(np.array([1e6]), fs, stages, n,
                               sparse_thresh_db=-100.0)
        assert not ch._sparse  # white-spectrum taps keep every alias row

    def test_r200_plan_matches_time_domain(self):
        """The fold-aware plan at R=200 (50 Msps -> 250 kHz) stays exact."""
        from sdrtpu.kernels.resample import RationalResampler
        from sdrtpu.shard.channelizer import (
            FftDecimatorChain,
            ModulatedDecimatorChain,
        )

        fs = 50e6
        n = 200000
        offsets = np.array([-20e6, -3.7e6, 11e6])
        rr = RationalResampler(fs, 250e3)
        stages = [
            (np.asarray(s.taps), s.decimation) for s in rr.predecim.stages
        ]
        assert int(np.prod([m for _, m in stages])) == 200
        x = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)).astype(
            np.complex64
        )
        ref_op = ModulatedDecimatorChain(offsets, fs, stages, n)
        _, ref = ref_op(ref_op.init_state(), jnp.asarray(x))
        fft_op = FftDecimatorChain(offsets, fs, stages, n)
        assert fft_op.n_chunks >= 8  # fold-aware plan: many chunks
        _, got = fft_op(fft_op.init_state(), jnp.asarray(x))
        ref, got = np.asarray(ref), np.asarray(got)
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got, ref, atol=4e-3 * scale)


class TestChannelizerRetune:
    """`Channelizer.retune_state` must cover every non-opt-in method
    (fft, xla-fused, plain xla): after a retune plus one tail-flush
    block, the output must match a fresh chain built at the new
    offsets (up to the carried mixer phase on the plain-xla path)."""

    @pytest.mark.parametrize("method", ["fft", "xla-fused", "xla"])
    def test_retune_matches_fresh_chain(self, method):
        from sdrtpu.shard.channelizer import Channelizer

        fs, f_if = 10_000_000.0, 250_000.0
        offs_a = np.array([-4e6, -1.2e6, 2e6])
        offs_b = np.array([-3.5e6, -0.7e6, 2.5e6])
        n = 40000
        cz = Channelizer(offs_a, fs, f_if, n, method=method)
        assert cz.method == method
        blocks = [
            (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)).astype(
                np.complex64
            )
            for _ in range(4)
        ]
        st = cz.init_state()
        st, _ = cz(st, jnp.asarray(blocks[0]))
        st = cz.retune_state(st, offs_b)

        fresh = Channelizer(offs_b, fs, f_if, n, method=method)
        fst = fresh.init_state()
        got = ref = None
        for b in blocks[1:]:
            st, got = cz(st, jnp.asarray(b))
            fst, ref = fresh(fst, jnp.asarray(b))
        got, ref = np.asarray(got), np.asarray(ref)
        scale = np.abs(ref).max()
        # every retune path preserves each channel's ACCUMULATED phase
        # (RxVFO::setOffset semantics — no phase step on unmoved
        # channels), so outputs agree with a fresh chain up to one
        # constant per-channel phase factor
        rot = np.sum(ref * np.conj(got), axis=-1)
        rot /= np.abs(rot)
        got = got * rot[:, None]
        np.testing.assert_allclose(got, ref, atol=5e-3 * scale)

    def test_retune_no_phase_step_on_unmoved_channels(self):
        """Retuning channel 0 must not jump the carried rotator phase of
        the untouched channel 1 (the audible-click bug): channel 1's
        output must continue EXACTLY as if no retune had happened."""
        from sdrtpu.shard.channelizer import Channelizer

        fs, f_if, n = 10_000_000.0, 250_000.0, 40000
        offs_a = np.array([-4e6, 2e6])
        offs_b = np.array([-3.5e6, 2e6])  # move only channel 0
        blocks = [
            (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)).astype(
                np.complex64
            )
            for _ in range(3)
        ]
        for method in ("fft", "xla-fused", "xla"):
            base = Channelizer(offs_a, fs, f_if, n, method=method)
            st_b = base.init_state()
            outs_b = []
            for b in blocks:
                st_b, y = base(st_b, jnp.asarray(b))
                outs_b.append(np.asarray(y))

            cz = Channelizer(offs_a, fs, f_if, n, method=method)
            st = cz.init_state()
            st, _ = cz(st, jnp.asarray(blocks[0]))
            st = cz.retune_state(st, offs_b)
            outs = []
            for b in blocks[1:]:
                st, y = cz(st, jnp.asarray(b))
                outs.append(np.asarray(y))
            # channel 1 (unmoved): bit-close continuation
            scale = np.abs(outs_b[1][1]).max()
            for got, ref in zip(outs, outs_b[1:]):
                np.testing.assert_allclose(
                    got[1], ref[1], atol=1e-4 * scale,
                    err_msg=f"method={method}",
                )

    def test_retune_no_retrace(self):
        import jax

        from sdrtpu.shard.channelizer import Channelizer

        fs, f_if, n = 10_000_000.0, 250_000.0, 40000
        offs = np.array([-4e6, 2e6])
        cz = Channelizer(offs, fs, f_if, n, method="xla-fused")
        traces = []

        @jax.jit
        def step(st, x):
            traces.append(1)
            return cz(st, x)

        st = cz.init_state()
        x = jnp.asarray(
            (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)).astype(
                np.complex64
            )
        )
        st, _ = step(st, x)
        st, _ = step(st, x)
        n_traces = len(traces)
        st = cz.retune_state(st, np.array([-3e6, 1e6]))
        st, _ = step(st, x)
        assert len(traces) == n_traces, "retune retraced the program"
