"""CCSDS concatenated deframer: encode -> corrupt -> decode loopback."""

import numpy as np

from sdrtpu.decoders.ccsds import (
    CVCDU_BYTES,
    CcsdsDeframer,
    CcsdsEncoder,
    ccsds_randomizer,
)

RNG = np.random.default_rng(52)


def test_randomizer_involution():
    r = ccsds_randomizer(64)
    data = RNG.integers(0, 256, 64).astype(np.uint8)
    np.testing.assert_array_equal((data ^ r) ^ r, data)


def test_clean_loopback():
    enc = CcsdsEncoder()
    dec = CcsdsDeframer()
    cvs = [RNG.integers(0, 256, CVCDU_BYTES).astype(np.uint8) for _ in range(2)]
    soft = enc.encode(cvs)
    frames = dec.process(soft)
    assert len(frames) == 2
    for got, want in zip(frames, cvs):
        np.testing.assert_array_equal(got, want)
    assert dec.rs_errors == [0, 0]


def test_noisy_loopback():
    enc = CcsdsEncoder()
    dec = CcsdsDeframer()
    cv = RNG.integers(0, 256, CVCDU_BYTES).astype(np.uint8)
    soft = enc.encode([cv]) + 0.5 * RNG.standard_normal(
        len(enc.encode([cv]))
    ).astype(np.float32)
    frames = dec.process(soft)
    assert len(frames) == 1
    np.testing.assert_array_equal(frames[0], cv)


def test_meteor_symbol_path():
    """Full config-4 chain shape: QPSK symbols -> soft bits -> frames."""
    enc = CcsdsEncoder()
    dec = CcsdsDeframer()
    cv = RNG.integers(0, 256, CVCDU_BYTES).astype(np.uint8)
    soft_bits = enc.encode([cv])
    # pack soft bits pairwise into QPSK symbols (I=even bits, Q=odd bits),
    # as the Meteor demodulator emits, then unpack like a receiver would
    syms = (soft_bits[0::2] + 1j * soft_bits[1::2]) / np.sqrt(2)
    rec = np.empty(len(soft_bits), np.float32)
    rec[0::2] = np.real(syms) * np.sqrt(2)
    rec[1::2] = np.imag(syms) * np.sqrt(2)
    frames = dec.process(rec)
    assert len(frames) == 1
    np.testing.assert_array_equal(frames[0], cv)
