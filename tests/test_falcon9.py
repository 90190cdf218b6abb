"""Falcon-9 telemetry decoder tests: dual basis, RS frames, packets, chain."""

import numpy as np
import jax.numpy as jnp

from sdrtpu.decoders.falcon9 import (
    BAUDRATE,
    DATA_BYTES,
    DEVIATION,
    DUAL_BASIS,
    FRAME_BITS,
    FRAME_DATA_LEN,
    FROM_DUAL,
    TO_DUAL,
    Falcon9Decoder,
    FalconPacketSync,
    _ASM_PATTERN,
    rs_frame_decode,
    rs_frame_encode,
)

RNG = np.random.default_rng(11)


class TestDualBasis:
    def test_roundtrip_and_linearity(self):
        x = np.arange(256, dtype=np.uint8)
        np.testing.assert_array_equal(FROM_DUAL[TO_DUAL[x]], x)
        np.testing.assert_array_equal(TO_DUAL[FROM_DUAL[x]], x)
        a = RNG.integers(0, 256, 100).astype(np.uint8)
        b = RNG.integers(0, 256, 100).astype(np.uint8)
        np.testing.assert_array_equal(TO_DUAL[a ^ b], TO_DUAL[a] ^ TO_DUAL[b])
        assert [int(TO_DUAL[1 << k]) for k in range(8)] == list(DUAL_BASIS)


class TestRsFrame:
    def test_roundtrip(self):
        data = RNG.integers(0, 256, DATA_BYTES).astype(np.uint8)
        frame = rs_frame_encode(data)
        out, nerr = rs_frame_decode(frame)
        assert nerr == 0
        np.testing.assert_array_equal(out, data)

    def test_error_correction(self):
        data = RNG.integers(0, 256, DATA_BYTES).astype(np.uint8)
        frame = rs_frame_encode(data).copy()
        # up to 8 byte errors per interleave lane are correctable
        idx = RNG.choice(len(frame), 30, replace=False)
        frame[idx] ^= RNG.integers(1, 256, 30).astype(np.uint8)
        out, nerr = rs_frame_decode(frame)
        assert out is not None and nerr > 0
        np.testing.assert_array_equal(out, data)


def make_frame_data(counter: int, pointer: int, body: bytes) -> np.ndarray:
    hdr = bytes(
        [
            (counter >> 13) & 0x3F,
            (counter >> 5) & 0xFF,
            ((counter & 0x1F) << 3) | ((pointer >> 8) & 0x7),
            pointer & 0xFF,
        ]
    )
    body = body[:FRAME_DATA_LEN].ljust(FRAME_DATA_LEN, b"\x00")
    return np.frombuffer(hdr + body, np.uint8)


def make_packet(pkt_id: int, payload: bytes) -> bytes:
    length = 10 + len(payload)
    return bytes([((length - 2) >> 8) & 0x0F, (length - 2) & 0xFF]) + pkt_id.to_bytes(
        8, "big"
    ) + payload


class TestPacketSync:
    def test_packets_within_frame(self):
        p1 = make_packet(0x0117FE0800320303, b"GPS WEEK 2300")
        p2 = make_packet(0x01123201042E1403, bytes(RNG.integers(0, 256, 40, dtype=np.uint8)))
        sync = FalconPacketSync()
        got = sync.process(make_frame_data(10, 0, p1 + p2))
        assert [g.pkt_id for g in got] == [0x0117FE0800320303, 0x01123201042E1403]
        assert got[0].payload == b"GPS WEEK 2300"

    def test_packet_spanning_frames(self):
        big = make_packet(0xABCDEF0011223344, bytes(RNG.integers(0, 256, 1500, dtype=np.uint8)))
        part1, part2 = big[:FRAME_DATA_LEN], big[FRAME_DATA_LEN:]
        sync = FalconPacketSync()
        assert sync.process(make_frame_data(5, 0, part1)) == []
        got = sync.process(make_frame_data(6, len(part2), part2 + make_packet(0x01, b"x")))
        assert [g.pkt_id for g in got] == [0xABCDEF0011223344, 0x01]
        assert len(got[0].payload) == 1500

    def test_missed_frame_drops_partial(self):
        big = make_packet(0x55, bytes(2000))
        sync = FalconPacketSync()
        sync.process(make_frame_data(5, 0, big[:FRAME_DATA_LEN]))
        # counter jumps: partial must be dropped, next packet still parses
        got = sync.process(
            make_frame_data(9, len(big) - FRAME_DATA_LEN,
                            big[FRAME_DATA_LEN:] + make_packet(0x77, b"ok"))
        )
        assert [g.pkt_id for g in got] == [0x77]


class TestFullChain:
    def test_iq_to_packets(self):
        fs = 4 * BAUDRATE
        payload = b"FALCON9 STAGE2 TLM"
        data = make_frame_data(100, 0, make_packet(0x01123201042E1403, payload))
        frame = rs_frame_encode(data)
        fbits = np.unpackbits(frame)
        pad = np.zeros(FRAME_BITS - fbits.size, np.uint8)  # 4 spare bytes
        bits = np.concatenate([_ASM_PATTERN, fbits, pad])
        assert bits.size == 32 + FRAME_BITS
        preamble = RNG.integers(0, 2, 400).astype(np.uint8)
        allbits = np.concatenate([preamble, bits, preamble[:120]])
        sym = np.repeat(2.0 * allbits.astype(np.float32) - 1.0, 4)
        phase = np.cumsum(2 * np.pi * DEVIATION / fs * sym)
        iq = np.exp(1j * phase).astype(np.complex64)
        dec = Falcon9Decoder(samplerate=fs)
        pkts = []
        for chunk in np.array_split(iq, 3):
            pkts.extend(dec.process(chunk))
        assert dec.deframer.frames_seen == 1
        assert dec.rs_failures == 0
        assert [p.pkt_id for p in pkts] == [0x01123201042E1403]
        assert pkts[0].payload == payload
