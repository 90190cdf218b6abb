"""Frequency xlator phase continuity + first-order IIR scans vs loops."""

import numpy as np
import jax.numpy as jnp

from sdrtpu.kernels.iir import DcBlocker, Deemphasis, first_order_recurrence
from sdrtpu.kernels.mixer import FreqXlator

RNG = np.random.default_rng(7)


class TestFreqXlator:
    def test_tone_shifted_to_dc(self):
        fs = 240000.0
        f = 57000.0
        n = np.arange(8192)
        x = np.exp(2j * np.pi * f / fs * n).astype(np.complex64)
        op = FreqXlator(-f, fs)
        state = op.init_state()
        state, y = op(state, jnp.asarray(x))
        y = np.asarray(y)
        # After mixing down, should be ~constant 1+0j
        assert np.max(np.abs(y - y[0])) < 1e-3
        assert abs(abs(y[0]) - 1.0) < 1e-4

    def test_phase_continuity_across_blocks(self):
        fs = 250000.0
        f = 19012.7  # non-round frequency
        n = np.arange(16384)
        x = np.ones(16384, np.complex64)
        op = FreqXlator(f, fs)
        state = op.init_state()
        chunks = []
        for i in range(0, len(x), 2048):
            state, y = op(state, jnp.asarray(x[i : i + 2048]))
            chunks.append(np.asarray(y))
        y = np.concatenate(chunks)
        expected = np.exp(2j * np.pi * f / fs * n)
        err = np.abs(y - expected)
        assert np.max(err) < 1e-3

    def test_long_run_no_drift(self):
        # 100 blocks: phase error must not accumulate beyond float32 noise.
        fs = 2.4e6
        f = -311017.3
        op = FreqXlator(f, fs)
        state = op.init_state()
        N = 4096
        last = None
        for b in range(100):
            state, y = op(state, jnp.ones(N, jnp.complex64))
            last = np.asarray(y)
        n0 = 99 * N
        expected = np.exp(2j * np.pi * (np.mod(f / fs * (n0 + np.arange(N)), 1.0)))
        assert np.max(np.abs(last - expected)) < 2e-3


class TestFirstOrder:
    def test_matches_sequential(self):
        a = 0.97
        x = RNG.standard_normal(1000).astype(np.float32)
        y0 = 0.5
        y_ref = np.empty_like(x)
        prev = y0
        for i, v in enumerate(x):
            prev = a * prev + v
            y_ref[i] = prev
        y = np.asarray(
            first_order_recurrence(np.float32(a), jnp.asarray(x), np.float32(y0))
        )
        np.testing.assert_allclose(y, y_ref, atol=1e-3)


class TestDeemphasis:
    def test_matches_reference_loop(self):
        fs = 48000.0
        tau = 50e-6
        dt = 1.0 / fs
        alpha = dt / (tau + dt)
        x = RNG.standard_normal(4096).astype(np.float32)
        ref = np.empty_like(x)
        last = 0.0
        for i, v in enumerate(x):
            last = alpha * v + (1 - alpha) * last
            ref[i] = last
        op = Deemphasis(tau, fs)
        st = op.init_state()
        st, y1 = op(st, jnp.asarray(x[:2048]))
        st, y2 = op(st, jnp.asarray(x[2048:]))
        y = np.concatenate([np.asarray(y1), np.asarray(y2)])
        np.testing.assert_allclose(y, ref, atol=1e-4)

    def test_stereo_channels(self):
        op = Deemphasis(75e-6, 48000.0, channels=2)
        st = op.init_state()
        x = RNG.standard_normal((2, 512)).astype(np.float32)
        st, y = op(st, jnp.asarray(x))
        assert y.shape == (2, 512)
        assert st.shape == (2, 1)

    def test_large_batch_mm_path_matches_small(self):
        # the flagship-sized (2, C, n) batch takes the banded-Toeplitz
        # matmul branch (kernels/iir.py); it must equal the unroll path
        op = Deemphasis(50e-6, 48000.0)
        x = RNG.standard_normal((2, 64, 2400)).astype(np.float32)
        st = np.zeros((), np.float32)
        _, y_big = op(st, jnp.asarray(x))  # total 307k >= mm threshold
        # per-row small calls stay on the unroll path
        y_rows = np.stack([
            np.stack([np.asarray(op(st, jnp.asarray(x[c, k]))[1])
                      for k in range(64)])
            for c in range(2)
        ])
        np.testing.assert_allclose(np.asarray(y_big), y_rows, atol=2e-5)


class TestDcBlocker:
    def test_matches_reference_loop(self):
        rate = 0.001
        x = (RNG.standard_normal(4096) + 0.7).astype(np.float32)
        ref = np.empty_like(x)
        offset = 0.0
        for i, v in enumerate(x):
            out = v - offset
            offset += out * rate
            ref[i] = out
        op = DcBlocker(rate, dtype=jnp.float32)
        st = op.init_state()
        st, y1 = op(st, jnp.asarray(x[:1024]))
        st, y2 = op(st, jnp.asarray(x[1024:]))
        y = np.concatenate([np.asarray(y1), np.asarray(y2)])
        np.testing.assert_allclose(y, ref, atol=1e-3)

    def test_removes_dc(self):
        op = DcBlocker(0.01, dtype=jnp.complex64)
        st = op.init_state()
        x = jnp.full(20000, 1.0 + 0.5j, jnp.complex64)
        st, y = op(st, x)
        assert abs(np.asarray(y)[-1]) < 1e-2


class TestTunableXlator:
    def test_matches_freq_xlator_bitwise(self):
        """The state-table mixer must equal FreqXlator exactly, across
        blocks and after a retune (golden for the live-retune path)."""
        import jax.numpy as jnp

        from sdrtpu.kernels.mixer import FreqXlator, TunableXlator

        fs, n = 1_000_000.0, 4096
        rng = np.random.default_rng(7)
        x = (rng.standard_normal(3 * n) + 1j * rng.standard_normal(3 * n)
             ).astype(np.complex64)
        a = FreqXlator(123_456.0, fs)
        b = TunableXlator(123_456.0, fs, n)
        sa, sb = a.init_state(), b.init_state()
        for i in range(3):
            sa, ya = a(sa, jnp.asarray(x[i * n:(i + 1) * n]))
            sb, yb = b(sb, jnp.asarray(x[i * n:(i + 1) * n]))
            np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb))
        # retune: phase stays continuous, new rate == fresh FreqXlator
        # started at the carried phase
        sb = b.retune_state(sb, -50_000.0)
        c = FreqXlator(-50_000.0, fs)
        sc = np.float32(sb["phase"])
        for i in range(3):
            sc, yc = c(sc, jnp.asarray(x[i * n:(i + 1) * n]))
            sb, yb = b(sb, jnp.asarray(x[i * n:(i + 1) * n]))
            np.testing.assert_array_equal(np.asarray(yc), np.asarray(yb))
