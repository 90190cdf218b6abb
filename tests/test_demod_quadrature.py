"""FM discriminator kernel tests."""

import numpy as np
import jax.numpy as jnp

from sdrtpu.kernels.demod import Quadrature


class TestQuadrature:
    def test_tone_recovery(self):
        # FM-modulate a 1 kHz tone, deviation 75 kHz, fs 250 kHz; demod
        # output should be the tone with amplitude 1.0.
        fs, dev, f_mod = 250000.0, 75000.0, 1000.0
        n = np.arange(65536)
        msg = np.sin(2 * np.pi * f_mod * n / fs)
        phase = np.cumsum(2 * np.pi * dev * msg / fs)
        x = np.exp(1j * phase).astype(np.complex64)

        op = Quadrature(dev, fs)
        st = op.init_state()
        st, y = op(st, jnp.asarray(x))
        y = np.asarray(y)[1000:]
        expected = msg[1000:]
        # amplitude ~1, correlation ~1
        corr = np.corrcoef(y, expected)[0, 1]
        assert corr > 0.9999
        assert abs(np.max(np.abs(y)) - 1.0) < 0.01

    def test_chunk_invariance(self):
        rng = np.random.default_rng(0)
        x = np.exp(1j * np.cumsum(rng.standard_normal(4096) * 0.3)).astype(
            np.complex64
        )
        op = Quadrature(50000.0, 250000.0)
        st = op.init_state()
        st, y_full = op(st, jnp.asarray(x))
        st = op.init_state()
        parts = []
        for i in range(0, 4096, 512):
            st, y = op(st, jnp.asarray(x[i : i + 512]))
            parts.append(np.asarray(y))
        np.testing.assert_allclose(
            np.asarray(y_full), np.concatenate(parts), atol=1e-5
        )
