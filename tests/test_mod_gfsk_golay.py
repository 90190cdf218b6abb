"""TX modulators, GFSK loopback, Golay(24,12) tests."""

import numpy as np
import jax.numpy as jnp

from sdrtpu.fec.golay import Golay24, encode24
from sdrtpu.kernels.mod import GfskMod, PskMod, QuadratureMod, RrcInterpolator
from sdrtpu.kernels.psk import Gfsk

RNG = np.random.default_rng(99)


class TestQuadratureMod:
    def test_fm_mod_demod_inverse(self):
        from sdrtpu.kernels.demod import Quadrature

        fs, dev = 48000.0, 5000.0
        t = np.arange(8192) / fs
        msg = np.sin(2 * np.pi * 700 * t).astype(np.float32)
        mod = QuadratureMod(dev, fs)
        st, iq = mod(mod.init_state(), jnp.asarray(msg))
        demod = Quadrature(dev, fs)
        st2, back = demod(demod.init_state(), iq)
        np.testing.assert_allclose(np.asarray(back)[1:], msg[1:], atol=1e-2)

    def test_constant_envelope(self):
        mod = QuadratureMod(1000.0, 48000.0)
        st, iq = mod(mod.init_state(), jnp.asarray(RNG.standard_normal(1000).astype(np.float32)))
        np.testing.assert_allclose(np.abs(np.asarray(iq)), 1.0, atol=1e-5)

    def test_phase_continuity(self):
        mod = QuadratureMod(5000.0, 48000.0)
        x = RNG.standard_normal(2048).astype(np.float32)
        st = mod.init_state()
        st, y1 = mod(st, jnp.asarray(x[:1024]))
        st, y2 = mod(st, jnp.asarray(x[1024:]))
        chunked = np.concatenate([np.asarray(y1), np.asarray(y2)])
        st2, full = mod(mod.init_state(), jnp.asarray(x))
        np.testing.assert_allclose(chunked, np.asarray(full), atol=1e-4)


class TestRrcInterp:
    def test_upsample_count_and_peaks(self):
        sps = 4
        syms = RNG.choice([-1.0, 1.0], 64).astype(np.float32)
        op = RrcInterpolator(sps, 33, 0.35, jnp.float32)
        st, y = op(op.init_state(), jnp.asarray(syms))
        assert np.asarray(y).shape[-1] == 64 * sps


class TestGfskLoopback:
    def test_bits_roundtrip(self):
        fs, baud, dev = 48000.0, 4800.0, 2400.0
        sps = int(fs / baud)
        bits = RNG.choice([-1.0, 1.0], 600).astype(np.float32)
        mod = GfskMod(sps, dev, fs, rrc_tap_count=4 * sps + 1, rrc_beta=0.5)
        st, iq = mod(mod.init_state(), jnp.asarray(bits))
        dem = Gfsk(baud, fs, dev, rrc_tap_count=4 * sps + 1, rrc_beta=0.5,
                   omega_gain=1e-4, mu_gain=0.05)
        st2, (syms, valid) = dem(dem.init_state(), iq)
        got = np.asarray(syms)[np.asarray(valid)]
        tail = np.sign(got[-400:])
        src = bits[-len(tail) - 20 :]
        # find best alignment
        best = 0.0
        for shift in range(20):
            seg = src[shift : shift + len(tail)]
            if len(seg) < len(tail):
                break
            best = max(best, np.mean(seg == tail))
        assert best > 0.95, f"bit match {best}"


class TestPskMod:
    def test_shaped_output(self):
        syms = np.exp(1j * (RNG.integers(0, 4, 128) * np.pi / 2 + np.pi / 4))
        mod = PskMod(4)
        st, y = mod(mod.init_state(), jnp.asarray(syms.astype(np.complex64)))
        assert np.asarray(y).shape[-1] == 512


class TestGolay:
    def test_roundtrip(self):
        g = Golay24()
        for data in (0x000, 0xFFF, 0xABC, 0x123):
            cw = encode24(data)
            out, nerr = g.decode24(cw)
            assert out == data and nerr == 0

    def test_corrects_three_errors(self):
        g = Golay24()
        data = 0x5A5
        cw = encode24(data)
        rng = np.random.default_rng(0)
        for _ in range(20):
            pos = rng.choice(23, 3, replace=False) + 1  # avoid parity bit
            bad = cw
            for p in pos:
                bad ^= 1 << int(p)
            out, nerr = g.decode24(bad)
            assert out == data, f"failed at {pos}"
            assert nerr == 3
