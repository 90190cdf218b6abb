"""RyFi modem codec loopback tests."""

import numpy as np

from sdrtpu.decoders.ryfi import (
    Frame,
    RyfiCodec,
    find_sync,
    pack_packets,
    unpack_packets,
)

RNG = np.random.default_rng(66)


def test_frame_serialize_roundtrip():
    f = Frame(counter=42, first_packet=0, last_packet=100,
              content=RNG.integers(0, 256, 886).astype(np.uint8))
    f2 = Frame.deserialize(f.serialize())
    assert f2.counter == 42 and f2.first_packet == 0 and f2.last_packet == 100
    np.testing.assert_array_equal(f2.content, f.content)


def test_codec_loopback_clean():
    codec = RyfiCodec()
    f = pack_packets([b"hello ryfi", b"second packet"], counter=7)
    syms = codec.encode_frame(f)
    bits = codec.symbols_to_bits(syms)
    i = find_sync(bits)
    assert i == 0
    frame, nerr = codec.decode_bits(bits[i + 64 :])
    assert frame is not None and nerr == 0
    assert frame.counter == 7
    pkts = unpack_packets(frame)
    assert pkts == [b"hello ryfi", b"second packet"]


def test_codec_with_symbol_errors():
    codec = RyfiCodec()
    f = pack_packets([b"error tolerant"], counter=1)
    syms = np.asarray(codec.encode_frame(f)).copy()
    # corrupt 1% of symbols (phase flips)
    idx = RNG.choice(len(syms) - 32, size=len(syms) // 100, replace=False) + 32
    syms[idx] = -syms[idx]
    bits = codec.symbols_to_bits(syms)
    i = find_sync(bits)
    assert i >= 0
    frame, nerr = codec.decode_bits(bits[i + 64 :])
    assert frame is not None, "uncorrectable"
    assert unpack_packets(frame) == [b"error tolerant"]


def test_sync_with_offset_and_noise():
    codec = RyfiCodec()
    f = pack_packets([b"x" * 100])
    syms = codec.encode_frame(f)
    bits = codec.symbols_to_bits(syms)
    stream = np.concatenate([RNG.integers(0, 2, 131).astype(np.uint8), bits])
    i = find_sync(stream)
    assert i == 131
