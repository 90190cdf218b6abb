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


def test_randomizer_standard_sequence():
    """Pins the CCSDS 131.0-B sequence itself (not just the involution),
    so off-air captures derandomize — loopback alone can't catch a
    wrong-tap LFSR."""
    np.testing.assert_array_equal(
        ccsds_randomizer(8),
        np.frombuffer(bytes.fromhex("ff480ec09a0d70bc"), np.uint8),
    )
    # 255-byte period... the BIT sequence has period 255, so the byte
    # sequence repeats every 255 bytes
    r = ccsds_randomizer(510)
    np.testing.assert_array_equal(r[:255], r[255:])


def test_streaming_frame_across_call_boundary():
    """A frame split across two process() calls must still decode."""
    enc = CcsdsEncoder()
    dec = CcsdsDeframer()
    cvs = [RNG.integers(0, 256, CVCDU_BYTES).astype(np.uint8)
           for _ in range(2)]
    soft = enc.encode(cvs)
    cut = len(soft) // 2 + 777  # mid-frame
    frames = dec.process(soft[:cut])
    frames += dec.process(soft[cut:])
    assert len(frames) == 2
    for got, want in zip(frames, cvs):
        np.testing.assert_array_equal(got, want)


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


def test_meteor_rf_end_to_end():
    """Config 4 fully end-to-end: RF IQ -> MeteorDemod -> s8 soft symbols
    -> ambiguity-resolved deframe -> recovered CVCDU payload bytes."""
    import jax.numpy as jnp
    import scipy.signal as sig

    from sdrtpu.decoders.ccsds import deframe_qpsk_symbols
    from sdrtpu.io.symbols import dequantize_soft, quantize_soft
    from sdrtpu.kernels.psk import MeteorDemod
    from sdrtpu.kernels import taps as tapsmod

    rng = np.random.default_rng(99)
    cvs = [rng.integers(0, 256, CVCDU_BYTES).astype(np.uint8) for _ in range(3)]
    soft_bits = CcsdsEncoder().encode(cvs)
    syms = (soft_bits[0::2] + 1j * soft_bits[1::2]).astype(np.complex128) / np.sqrt(2)
    # settle preamble for AGC/Costas/MM lock
    pre = np.exp(1j * (rng.integers(0, 4, 3000) * np.pi / 2 + np.pi / 4))
    tx = np.concatenate([pre, syms])

    # 72 ksym at 150 ksps (sps = 25/12), RRC beta=0.6 like the reference
    up = np.zeros(len(tx) * 25, np.complex128)
    up[::25] = tx
    h = tapsmod.root_raised_cosine_rate(251, 0.6, 1.0, 25.0).astype(np.float64)
    shaped = np.convolve(up, h, "same") * 25
    x = sig.resample_poly(shaped, 1, 12).astype(np.complex64)

    # channel: phase + 100 Hz offset + noise
    fs = 150000.0
    n = len(x)
    x = x * np.exp(1j * (0.7 + 2 * np.pi * 100.0 * np.arange(n) / fs)).astype(
        np.complex64
    )
    x = x + (0.05 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))).astype(
        np.complex64
    )

    d = MeteorDemod()
    st, (out, valid) = d(d.init_state(), jnp.asarray(x))
    got = np.asarray(out)[np.asarray(valid)]

    # reference-parity soft path: s8 quantization at x84 (meteor main.cpp:198)
    s8 = quantize_soft(got)
    soft_syms = dequantize_soft(s8)

    frames, dec = deframe_qpsk_symbols(soft_syms)
    assert len(frames) >= 2, f"only {len(frames)} frames decoded"
    matched = sum(
        any(np.array_equal(f, cv) for cv in cvs) for f in frames
    )
    assert matched >= 2, f"only {matched} frames matched payload"


def test_chunked_qpsk_streaming():
    """Symbols fed in chunks smaller than one frame must still decode:
    each rotation candidate keeps its own streaming tail."""
    from sdrtpu.decoders.ccsds import deframe_qpsk_symbols

    enc = CcsdsEncoder()
    cvs = [RNG.integers(0, 256, CVCDU_BYTES).astype(np.uint8)
           for _ in range(4)]
    soft = enc.encode(cvs)
    syms = (soft[0::2] + 1j * soft[1::2]).astype(np.complex64)
    syms *= np.exp(1j * np.pi / 2)  # Costas locked 90 deg off
    frames, dec = [], None
    for i in range(0, len(syms), 3000):  # < 1 frame (8224 syms) per call
        f, dec = deframe_qpsk_symbols(syms[i:i + 3000], dec)
        frames += f
    assert len(frames) == 4, len(frames)
    for got, want in zip(frames, cvs):
        np.testing.assert_array_equal(got, want)
    assert dec.rs_errors == [0, 0, 0, 0]


def test_chunked_qpsk_streaming_unrotated():
    """Chunked input with NO rotation (k=0 locks first): after the lock
    the other rotation candidate must never be fed into the (aliased)
    locked deframer, or frames straddling the lock call are lost
    (advisor finding r2, ccsds.py:230)."""
    from sdrtpu.decoders.ccsds import deframe_qpsk_symbols

    enc = CcsdsEncoder()
    cvs = [RNG.integers(0, 256, CVCDU_BYTES).astype(np.uint8)
           for _ in range(4)]
    soft = enc.encode(cvs)
    syms = (soft[0::2] + 1j * soft[1::2]).astype(np.complex64)
    frames, dec = [], None
    for i in range(0, len(syms), 3000):
        f, dec = deframe_qpsk_symbols(syms[i:i + 3000], dec)
        frames += f
    assert len(frames) == 4, len(frames)
    for got, want in zip(frames, cvs):
        np.testing.assert_array_equal(got, want)
    assert dec.rs_errors == [0, 0, 0, 0]
