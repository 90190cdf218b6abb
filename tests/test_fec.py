"""FEC tests: convolutional/Viterbi + Reed-Solomon + digital primitives."""

import numpy as np
import jax.numpy as jnp

from sdrtpu.fec.reed_solomon import ReedSolomon
from sdrtpu.fec.viterbi import ConvEncoder, ViterbiDecoder
from sdrtpu.kernels.digital import (
    DifferentialDecoder,
    ManchesterDecoder,
    binary_slice,
)

RNG = np.random.default_rng(55)


class TestViterbi:
    def test_noiseless_roundtrip(self):
        enc = ConvEncoder()
        dec = ViterbiDecoder()
        bits = RNG.integers(0, 2, 500).astype(np.uint8)
        soft = enc.encode_to_soft(bits)
        out = np.asarray(dec.decode(jnp.asarray(soft)))
        np.testing.assert_array_equal(out, bits)

    def test_noisy_decode(self):
        enc = ConvEncoder()
        dec = ViterbiDecoder()
        bits = RNG.integers(0, 2, 1000).astype(np.uint8)
        soft = enc.encode_to_soft(bits)
        noisy = soft + 0.6 * RNG.standard_normal(len(soft)).astype(np.float32)
        out = np.asarray(dec.decode(jnp.asarray(noisy)))
        ber = np.mean(out != bits)
        assert ber < 0.005, f"BER {ber}"

    def test_hard_errors_corrected(self):
        enc = ConvEncoder()
        dec = ViterbiDecoder()
        bits = RNG.integers(0, 2, 800).astype(np.uint8)
        soft = enc.encode_to_soft(bits)
        flip = RNG.choice(len(soft), size=len(soft) // 25, replace=False)
        soft[flip] = -soft[flip]  # 4% symbol errors
        out = np.asarray(dec.decode(jnp.asarray(soft)))
        assert np.mean(out != bits) < 0.01

    def test_other_polynomial(self):
        # K=5 code
        enc = ConvEncoder(5, (0o27, 0o31))
        dec = ViterbiDecoder(5, (0o27, 0o31))
        bits = RNG.integers(0, 2, 300).astype(np.uint8)
        out = np.asarray(dec.decode(jnp.asarray(enc.encode_to_soft(bits))))
        np.testing.assert_array_equal(out, bits)


class TestReedSolomon:
    def test_roundtrip_no_errors(self):
        rs = ReedSolomon()
        data = RNG.integers(0, 256, rs.k).astype(np.uint8)
        cw = rs.encode(data)
        out, n = rs.decode(cw)
        assert n == 0
        np.testing.assert_array_equal(out, data)

    def test_corrects_up_to_t_errors(self):
        rs = ReedSolomon()
        data = RNG.integers(0, 256, rs.k).astype(np.uint8)
        cw = rs.encode(data).copy()
        pos = RNG.choice(255, size=16, replace=False)
        cw[pos] ^= RNG.integers(1, 256, 16).astype(np.uint8)
        out, n = rs.decode(cw)
        assert n == 16
        np.testing.assert_array_equal(out, data)

    def test_fails_beyond_t(self):
        rs = ReedSolomon()
        data = RNG.integers(0, 256, rs.k).astype(np.uint8)
        cw = rs.encode(data).copy()
        pos = RNG.choice(255, size=40, replace=False)
        cw[pos] ^= RNG.integers(1, 256, 40).astype(np.uint8)
        out, n = rs.decode(cw)
        assert n == -1  # detected as uncorrectable

    def test_classic_prim_poly(self):
        rs = ReedSolomon(nroots=16, prim_poly=0x11D, fcr=0, prim=1)
        data = RNG.integers(0, 256, rs.k).astype(np.uint8)
        cw = rs.encode(data).copy()
        pos = RNG.choice(255, size=8, replace=False)
        cw[pos] ^= RNG.integers(1, 256, 8).astype(np.uint8)
        out, n = rs.decode(cw)
        assert n == 8
        np.testing.assert_array_equal(out, data)


class TestDigital:
    def test_binary_slice(self):
        x = jnp.asarray([-1.0, 0.5, 0.0, 2.0])
        np.testing.assert_array_equal(np.asarray(binary_slice(x)), [0, 1, 0, 1])

    def test_differential_decoder(self):
        d = DifferentialDecoder(2)
        st = d.init_state()
        x = jnp.asarray([1, 1, 0, 1, 0, 0], jnp.uint8)
        st, y = d(st, x)
        np.testing.assert_array_equal(np.asarray(y), [1, 0, 1, 1, 1, 0])

    def test_manchester(self):
        m = ManchesterDecoder()
        _, y = m((), jnp.asarray([1, 0, 0, 1, 1, 1], jnp.uint8))
        np.testing.assert_array_equal(np.asarray(y), [1, 0, 1])
