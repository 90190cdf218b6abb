"""Sharding tests on the 8-device virtual CPU mesh.

Validates (SURVEY §4 implication (c)): overlap-save boundary exchange is
bit-exact vs the single-device run, and the channel-sharded channelizer
matches the unsharded one.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from sdrtpu.kernels import taps as tapsmod
from sdrtpu.kernels.fir import Fir
from sdrtpu.shard.channelizer import Channelizer, MultiVfoMixer
from sdrtpu.shard.mesh import make_mesh, shard_channel_state
from sdrtpu.shard.overlap import time_sharded_fir

RNG = np.random.default_rng(21)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


class TestTimeShardedFir:
    def test_matches_single_device(self):
        mesh = make_mesh(n_channel=1, n_time=8)
        h = tapsmod.low_pass(0.2, 0.05, 1.0)
        x = RNG.standard_normal(4096).astype(np.float32)
        tail0 = np.zeros(len(h) - 1, np.float32)

        tail, y = time_sharded_fir(mesh, h, jnp.asarray(x), jnp.asarray(tail0))
        # single-device streaming reference
        op = Fir(h, dtype=jnp.float32)
        st, y_ref = op(op.init_state(), jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(tail), x[-(len(h) - 1) :], atol=0)

    def test_streaming_across_blocks(self):
        mesh = make_mesh(n_channel=1, n_time=8)
        h = tapsmod.low_pass(0.25, 0.1, 1.0)
        x = RNG.standard_normal(8192).astype(np.float32)
        op = Fir(h, dtype=jnp.float32)
        st, y_ref = op(op.init_state(), jnp.asarray(x))

        tail = jnp.zeros(len(h) - 1, jnp.float32)
        outs = []
        for i in range(0, 8192, 2048):
            tail, y = time_sharded_fir(mesh, h, jnp.asarray(x[i : i + 2048]), tail)
            outs.append(np.asarray(y))
        np.testing.assert_allclose(
            np.concatenate(outs), np.asarray(y_ref), atol=1e-5
        )


class TestMultiVfo:
    def test_mixer_matches_scalar(self):
        from sdrtpu.kernels.mixer import FreqXlator

        fs = 1_000_000.0
        n = 4096
        offs = [-100e3, 0.0, 250e3]
        x = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)).astype(
            np.complex64
        )
        mv = MultiVfoMixer(offs, fs, n)
        st, y = mv(mv.init_state(), jnp.asarray(x))
        y = np.asarray(y)
        for c, f in enumerate(offs):
            ref_op = FreqXlator(f, fs)
            _, yr = ref_op(ref_op.init_state(), jnp.asarray(x))
            np.testing.assert_allclose(y[c], np.asarray(yr), atol=1e-3)

    def test_channelizer_extracts_tones(self):
        # 8 channels on a 2.4 Msps wideband signal; each channel carries a
        # distinct tone at its center + 1 kHz.
        fs = 2_400_000.0
        out_sr = 50000.0
        n = 49152  # multiple of the 2.4M->50k block quantum (48)
        centers = np.linspace(-900e3, 900e3, 8)
        t = np.arange(n) / fs
        x = sum(
            0.1 * np.exp(2j * np.pi * (fc + 1000.0) * t) for fc in centers
        ).astype(np.complex64)
        ch = Channelizer(centers, fs, out_sr, block_len=n)
        st, y = ch(ch.init_state(), jnp.asarray(x))
        y = np.asarray(y)
        assert y.shape == (8, int(n * out_sr / fs))
        for c in range(8):
            seg = y[c][500:]
            spec = np.abs(np.fft.fft(seg * np.hanning(len(seg))))
            freqs = np.fft.fftfreq(len(seg), 1.0 / out_sr)
            peak = freqs[np.argmax(spec)]
            # bin width ~95 Hz on the 524-sample segment
            assert abs(peak - 1000.0) < 100.0, f"ch{c}: peak {peak}"

    def test_channel_sharded_matches_unsharded(self):
        fs = 2_400_000.0
        out_sr = 50000.0
        n = 12288
        centers = np.linspace(-900e3, 900e3, 8)
        t = np.arange(n) / fs
        x = sum(
            0.1 * np.exp(2j * np.pi * (fc + 1000.0) * t) for fc in centers
        ).astype(np.complex64)

        ch = Channelizer(centers, fs, out_sr, block_len=n)
        st0 = ch.init_state()
        _, y_ref = ch(st0, jnp.asarray(x))

        mesh = make_mesh(n_channel=8, n_time=1)
        st_sharded = shard_channel_state(mesh, st0, 8)
        step = jax.jit(lambda s, a: ch(s, a))
        new_st, y = step(st_sharded, jnp.asarray(x))
        # the output must actually live distributed over the channel axis:
        # each device holds at most 1 of the 8 channel rows (XLA may not
        # report the named spec, but it must not silently replicate)
        assert y.sharding.shard_shape(y.shape)[0] == 1, y.sharding
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)

    def test_fold_table_stays_channel_sharded(self):
        """The (C, R, nif) filter-spectrum table — the dominant state, tens
        of MB at production sizes — must remain channel-sharded through the
        step, not silently replicated per device."""
        fs, out_sr, n = 2_000_000.0, 250_000.0, 16000
        centers = np.linspace(-800e3, 800e3, 8)
        ch = Channelizer(centers, fs, out_sr, block_len=n)
        st0 = ch.init_state()
        assert "hf" in st0["fused"], "fft channelizer expected for this plan"
        mesh = make_mesh(n_channel=8, n_time=1)
        st = shard_channel_state(mesh, st0, 8)
        hf_in = st["fused"]["hf"]
        assert hf_in.sharding.shard_shape(hf_in.shape)[0] == 1, hf_in.sharding
        step = jax.jit(lambda s, a: ch(s, a))
        rng = np.random.default_rng(5)
        x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
            np.complex64
        )
        new_st, y = step(st, jnp.asarray(x))
        hf = new_st["fused"]["hf"]
        assert hf.sharding.shard_shape(hf.shape)[0] == 1, hf.sharding
        assert y.sharding.shard_shape(y.shape)[0] == 1, y.sharding


class TestTimeShardedChannelizer:
    """Config-5 mechanism: the FFT channelizer front end time-sharded."""

    def test_matches_unsharded_across_blocks(self):
        from sdrtpu.kernels.resample import RationalResampler
        from sdrtpu.shard.channelizer import FftDecimatorChain
        from sdrtpu.shard.overlap import time_sharded_channelizer

        fs, f_if = 2_000_000.0, 250_000.0
        n_time = 8
        n_local = 8000
        N = n_time * n_local
        offsets = np.array([-700e3, -50e3, 412e3])
        rr = RationalResampler(fs, f_if)
        stages = [
            (np.asarray(s.taps), s.decimation) for s in rr.predecim.stages
        ]

        rng = np.random.default_rng(7)
        x = (
            rng.standard_normal(2 * N) + 1j * rng.standard_normal(2 * N)
        ).astype(np.complex64)

        # unsharded reference on full global blocks
        full = FftDecimatorChain(offsets, fs, stages, N)
        st_f = full.init_state()
        refs = []
        for blk in x.reshape(2, N):
            st_f, y = full(st_f, jnp.asarray(blk))
            refs.append(np.asarray(y))
        ref = np.concatenate(refs, axis=-1)

        # time-sharded: local chain + halo/phase exchange over the mesh
        mesh = make_mesh(n_channel=1, n_time=n_time)
        local = FftDecimatorChain(offsets, fs, stages, n_local)
        st = local.init_state()
        outs = []
        for blk in x.reshape(2, N):
            st, y = time_sharded_channelizer(mesh, local, jnp.asarray(blk), st)
            outs.append(np.asarray(y))
        got = np.concatenate(outs, axis=-1)

        assert got.shape == ref.shape
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got, ref, atol=4e-3 * scale)

    def test_2d_mesh_channel_and_time(self):
        """(channel, time) mesh: VFO set and wideband span both sharded."""
        from sdrtpu.kernels.resample import RationalResampler
        from sdrtpu.shard.channelizer import FftDecimatorChain
        from sdrtpu.shard.overlap import time_sharded_channelizer

        fs, f_if = 2_000_000.0, 250_000.0
        n_ch_shards, n_time = 4, 2
        n_local = 16000
        N = n_time * n_local
        offsets = np.linspace(-800e3, 800e3, 8)  # 8 VFOs / 4 channel shards
        rr = RationalResampler(fs, f_if)
        stages = [
            (np.asarray(s.taps), s.decimation) for s in rr.predecim.stages
        ]
        rng = np.random.default_rng(11)
        x = (rng.standard_normal(N) + 1j * rng.standard_normal(N)).astype(
            np.complex64
        )

        full = FftDecimatorChain(offsets, fs, stages, N)
        _, ref = full(full.init_state(), jnp.asarray(x))
        ref = np.asarray(ref)

        mesh = make_mesh(n_channel=n_ch_shards, n_time=n_time)
        local = FftDecimatorChain(offsets, fs, stages, n_local)
        st, y = time_sharded_channelizer(
            mesh, local, jnp.asarray(x), local.init_state()
        )
        got = np.asarray(y)
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got, ref, atol=4e-3 * scale)


class TestShardedFlagship:
    """The ACTUAL flagship (WbfmMultiVfoPipeline) sharded over the full
    (channel, time) mesh matches the unsharded pipeline (VERDICT r1 #2)."""

    def test_matches_unsharded(self):
        from sdrtpu.apps.wbfm_pipeline import WbfmMultiVfoPipeline
        from sdrtpu.shard.flagship import ShardedWbfmPipeline

        fs = 2_000_000.0
        block = 2000
        offs = np.linspace(-0.35, 0.35, 4) * fs
        n_blocks = 5
        N = n_blocks * block
        t = np.arange(N) / fs
        x = np.zeros(N, np.complex128)
        for i, f0 in enumerate(offs):
            L = np.sin(2 * np.pi * (400 + 200 * i) * t)
            R = np.sin(2 * np.pi * (900 + 200 * i) * t)
            mpx = (0.45 * (L + R) + 0.1 * np.sin(2 * np.pi * 19000 * t)
                   + 0.45 * (L - R) * np.sin(2 * np.pi * 38000 * t))
            ph = np.cumsum(2 * np.pi * 75000.0 * mpx / fs)
            x += 0.4 * np.exp(1j * (2 * np.pi * f0 * t + ph))
        x = x.astype(np.complex64)

        pipe = WbfmMultiVfoPipeline(offs, fs, block, channelizer_method="fft")
        mesh = make_mesh(n_channel=4, n_time=2)
        sh = ShardedWbfmPipeline(offs, fs, block, mesh)
        st_u = pipe.init_state()
        st_s = shard_channel_state(mesh, sh.init_state(), 4)
        errs = []
        for blk in x.reshape(n_blocks, block):
            st_u, a = pipe(st_u, jnp.asarray(blk))
            st_s, b = sh(st_s, jnp.asarray(blk))
            errs.append(float(jnp.abs(a - b).max()))
        # Blocks 0-2 are the filter-fill transient: the channelizer output
        # starts at ~0 (zero tails) and angle() of near-zero samples
        # amplifies float rounding unboundedly — information-free garbage
        # in both implementations, flushed once the 317-tap pilot FIR
        # fills (~1.3 IF blocks).  The envelope pilot's mean(r^2)
        # normalization spreads any warmup-sample difference across its
        # whole block, extending the visible transient by one block at
        # these tiny (250-IF-sample) test blocks.  Steady state must be
        # bit-close.
        assert max(errs[3:]) < 1e-4, errs


class TestPrefixRelock:
    """SURVEY §7 hard part: sequential feedback loops time-sharded via
    prefix relock — the single-channel time-scaling path."""

    def _wfm_signal(self, fs, n):
        t = np.arange(n) / fs
        L = np.sin(2 * np.pi * 440.0 * t)
        R = np.sin(2 * np.pi * 1200.0 * t)
        mpx = (0.45 * (L + R) / 2 + 0.1 * np.sin(2 * np.pi * 19000.0 * t)
               + 0.45 * ((L - R) / 2) * np.sin(2 * np.pi * 38000.0 * t))
        ph = np.cumsum(2 * np.pi * 75000.0 * mpx / fs)
        return (0.8 * np.exp(1j * ph)).astype(np.complex64)

    def test_wfm_pll_chain_time_shards(self):
        """Full WFM stereo demod with the SEQUENTIAL pilot PLL, sharded
        over 8 time shards: relock residual must sit ~40 dB under the
        audio, and streaming across global blocks must be seamless."""
        from sdrtpu.kernels.wfm import BroadcastFm
        from sdrtpu.shard.overlap import time_sharded_relock
        from sdrtpu.graph.block import StreamOp

        fs = 250_000.0
        relock = 6000
        n_local = 8000
        N = 8 * n_local

        class StereoOnly(StreamOp):
            def __init__(self):
                self.op = BroadcastFm(75000.0, fs, stereo=True,
                                      low_pass=True, pilot_mode="pll")

            def init_state(self):
                return self.op.init_state()

            def __call__(self, state, x):
                st, (stereo, _) = self.op(state, x)
                return st, stereo

        op = StereoOnly()
        x = self._wfm_signal(fs, 2 * N)

        # unsharded streaming reference
        ref_op = StereoOnly()
        st = ref_op.init_state()
        refs = []
        for blk in x.reshape(2, N):
            st, y = ref_op(st, jnp.asarray(blk))
            refs.append(np.asarray(y))
        ref = np.concatenate(refs, axis=-1)

        mesh = make_mesh(n_channel=1, n_time=8)
        tail = jnp.zeros(relock, jnp.complex64)
        outs = []
        for blk in x.reshape(2, N):
            tail, y = time_sharded_relock(
                mesh, op, jnp.asarray(blk), tail, relock,
                out_spec=P(None, "time"),
            )
            outs.append(np.asarray(y))
        got = np.concatenate(outs, axis=-1)

        assert got.shape == ref.shape
        # skip the global stream's own startup transient
        skip = 12000
        err = got[:, skip:] - ref[:, skip:]
        snr = 10 * np.log10(np.sum(ref[:, skip:] ** 2)
                            / max(np.sum(err ** 2), 1e-30))
        assert snr > 40.0, snr

    def test_relock_tail_carried(self):
        """The carried value is the input tail; block boundaries must not
        leave a seam (shard 0 of block k relocks on block k-1's tail)."""
        from sdrtpu.kernels.iir import Deemphasis
        from sdrtpu.shard.overlap import time_sharded_relock

        fs = 48000.0
        relock = 2048
        N = 8 * 4000
        rng = np.random.default_rng(3)
        x = rng.standard_normal(2 * N).astype(np.float32)

        op = Deemphasis(50e-6, fs)
        st = op.init_state()
        refs = []
        for blk in x.reshape(2, N):
            st, y = op(st, jnp.asarray(blk))
            refs.append(np.asarray(y))
        ref = np.concatenate(refs)

        mesh = make_mesh(n_channel=1, n_time=8)
        tail = jnp.zeros(relock, jnp.float32)
        outs = []
        for blk in x.reshape(2, N):
            tail, y = time_sharded_relock(
                mesh, op, jnp.asarray(blk), tail, relock
            )
            outs.append(np.asarray(y))
        got = np.concatenate(outs)
        # 1-pole IIR forgets in ~tau*fs samples << relock: all samples
        # after the very first global block's first shard match tightly
        np.testing.assert_allclose(got[relock:], ref[relock:], atol=2e-5)
