"""M17 frame-layer tests: LSF/stream encode->decode loopback."""

import numpy as np

from sdrtpu.decoders.m17 import (
    FRAME_BITS,
    M17BitSync,
    M17FrameDecoder,
    decode_callsign,
    encode_callsign,
    encode_lsf_frame,
    encode_stream_frame,
    slice_4fsk,
)

RNG = np.random.default_rng(12)


class TestCallsign:
    def test_roundtrip(self):
        for call in ("N0CALL", "SP5WWP", "AB1CDE/M"):
            assert decode_callsign(encode_callsign(call)) == call


class TestLsf:
    def test_encode_decode(self):
        frame = encode_lsf_frame("N0CALL", "SP5WWP")
        sync = M17BitSync()
        results = sync.process(np.concatenate([RNG.integers(0, 2, 23).astype(np.uint8), frame]))
        assert results and results[0][0] == "lsf"
        lsf = results[0][1]
        assert lsf["crc_ok"]
        assert lsf["dst"] == "N0CALL" and lsf["src"] == "SP5WWP"

    def test_bit_errors_corrected(self):
        frame = encode_lsf_frame("N0CALL", "SP5WWP").copy()
        flip = RNG.choice(FRAME_BITS, 6, replace=False) + 16
        frame[flip] ^= 1
        sync = M17BitSync()
        results = sync.process(frame)
        assert results and results[0][1]["crc_ok"], "Viterbi failed to correct"


class TestStream:
    def test_voice_frames(self):
        voice = RNG.integers(0, 2, 128).astype(np.uint8)
        frames = [encode_stream_frame(fn, voice, chunk_idx=fn % 6)
                  for fn in range(4)]
        sync = M17BitSync()
        results = sync.process(np.concatenate(frames))
        assert len(results) == 4
        for i, (t, payload) in enumerate(results):
            assert t == "stream"
            fn, v = payload
            assert fn == i
            np.testing.assert_array_equal(v, voice)


class TestSlicer:
    def test_dibit_mapping(self):
        # normalized symbols: +1, +1/3, -1/3, -1
        syms = np.array([1.0, 1 / 3, -1 / 3, -1.0])
        bits = slice_4fsk(syms)
        # +3 -> 01, +1 -> 00, -1 -> 10, -3 -> 11
        np.testing.assert_array_equal(bits, [0, 1, 0, 0, 1, 0, 1, 1])
