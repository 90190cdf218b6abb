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


class TestVocoder:
    def test_voice_loopback_to_audio(self):
        """Known PCM -> codec2 3200 encode -> M17 stream frames -> frame
        decode -> M17Vocoder == direct codec2 decode (bit-exact voice
        path), per the reference's m17dsp.h:509-510 wiring."""
        import pytest

        from sdrtpu.decoders.m17 import M17Vocoder
        try:
            from sdrtpu.decoders.codec2 import MODE_3200, Codec2
        except Exception:
            pytest.skip("codec2 import failed")
        if not Codec2.available():
            pytest.skip("system libcodec2 not installed")

        t = np.arange(8 * 320) / 8000.0
        pcm = (5000 * np.sin(2 * np.pi * 200 * t)
               * np.hanning(len(t))).astype(np.int16)
        enc = Codec2(MODE_3200)
        c2frames = enc.encode(pcm)  # 16 x 8-byte frames

        # two codec2 frames (16 bytes = 128 bits) per M17 stream frame
        tx = []
        for fn in range(8):
            chunk = c2frames[fn * 16:(fn + 1) * 16]
            bits = np.unpackbits(np.frombuffer(chunk, np.uint8))
            tx.append(encode_stream_frame(fn, bits, chunk_idx=fn % 6))
        sync = M17BitSync()
        results = sync.process(np.concatenate(tx))
        assert len(results) == 8
        frames = [payload for typ, payload in results if typ == "stream"]

        voc = M17Vocoder()
        audio = voc.vocode(frames)
        assert audio.shape == (8 * 320,)
        ref = Codec2(MODE_3200).decode(c2frames).astype(np.float32) / 32768.0
        # codec2 synthesis adds random phase jitter on unvoiced bands
        # (global rand() in the C library), so decode is not bit-repeatable
        # even for identical bits — compare within that jitter
        np.testing.assert_allclose(audio, ref, atol=2e-3)
        corr = np.corrcoef(audio, ref)[0, 1]
        assert corr > 0.999, corr
        # stereo duplication like the reference
        st = M17Vocoder().vocode_stereo(frames)
        assert st.shape == (2, 8 * 320)
        np.testing.assert_array_equal(st[0], st[1])

    def test_nonconsecutive_squelch(self):
        import pytest

        from sdrtpu.decoders.m17 import M17Vocoder
        if not M17Vocoder.available():
            pytest.skip("system libcodec2 not installed")
        bits = np.zeros(128, np.uint8)
        voc = M17Vocoder()
        a = voc.vocode([(0, bits), (1, bits), (5, bits), (6, bits)])
        # frame 5 breaks the run (dropped); 0, 1 and the re-armed 6 play
        assert a.shape == (3 * 320,)


class TestLichLsf:
    def test_lsf_recovered_from_lich_chunks(self):
        """A receiver that missed the LSF frame reassembles it from the
        stream frames' LICH chunks (mid-stream join)."""
        from sdrtpu.decoders.m17 import lsf_content_bits

        lsf_bits = lsf_content_bits("N0CALL", "SP5WWP")
        voice = RNG.integers(0, 2, 128).astype(np.uint8)
        tx = []
        for fn in range(6):
            ci = fn % 6
            tx.append(encode_stream_frame(
                fn, voice, lich_chunk=lsf_bits[ci * 40:(ci + 1) * 40],
                chunk_idx=ci))
        sync = M17BitSync()
        assert sync.decoder.lsf_from_lich() is None  # nothing seen yet
        sync.process(np.concatenate(tx))
        lsf = sync.decoder.lsf_from_lich()
        assert lsf is not None and lsf["crc_ok"]
        assert lsf["dst"] == "N0CALL" and lsf["src"] == "SP5WWP"
