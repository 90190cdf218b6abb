"""RyFi data modem codec stack (``decoder_modules/ryfi_decoder`` capability).

SDR++'s experimental QPSK packet modem: packets are packed into fixed
frames, protected by 4 x RS(255,223) (CCSDS polynomial, fcr=1, prim=1) and
a rate-1/2 K=7 convolutional code, scrambled, prefixed with a 64-bit sync
word, and sent as QPSK symbols.

    Packet(s) -> Frame(counter, firstPacket, lastPacket, 886B data)
      -> RS encode (4 blocks) -> scramble -> conv encode -> sync + QPSK

This module implements the full TX and RX stacks with sdrtpu's own FEC
engines; the scrambler is a PRBS generated from x^8+x^6+x^5+x^4+1 (the
reference ships an opaque expanded table — sdrtpu's sequence is
self-consistent between its TX and RX).
"""

from __future__ import annotations

import numpy as np

from ..fec.reed_solomon import ReedSolomon
from ..fec.viterbi import ConvEncoder, ViterbiDecoder

SYNC_WORD = 0x341CC540819D8963
SYNC_BITS = 64
RS_BLOCKS = 4
RS_N, RS_K = 255, 223
FRAME_SIZE = RS_K * RS_BLOCKS          # 892 bytes of frame payload
FRAME_DATA_SIZE = FRAME_SIZE - 6       # 886 data bytes
ENC_FRAME_BYTES = RS_N * RS_BLOCKS     # 1020 after RS
CONV_K = 7
CONV_POLYS = (0o171, 0o133)


def _prbs(n: int) -> np.ndarray:
    """Byte scrambler sequence from an x^8+x^6+x^5+x^4+1 LFSR."""
    reg = 0xFF
    out = np.empty(n, np.uint8)
    for i in range(n):
        out[i] = reg
        fb = ((reg >> 7) ^ (reg >> 5) ^ (reg >> 4) ^ (reg >> 3)) & 1
        reg = ((reg << 1) | fb) & 0xFF
    return out


SCRAMBLER = _prbs(ENC_FRAME_BYTES)


class Frame:
    def __init__(self, counter=0, first_packet=0xFFFF, last_packet=0xFFFF,
                 content=None):
        self.counter = counter
        self.first_packet = first_packet
        self.last_packet = last_packet
        self.content = (
            np.zeros(FRAME_DATA_SIZE, np.uint8) if content is None else content
        )

    def serialize(self) -> np.ndarray:
        out = np.zeros(FRAME_SIZE, np.uint8)
        out[0:2] = divmod(self.counter, 256)
        out[2:4] = divmod(self.first_packet, 256)
        out[4:6] = divmod(self.last_packet, 256)
        out[6:] = self.content
        return out

    @classmethod
    def deserialize(cls, data: np.ndarray) -> "Frame":
        d = np.asarray(data, np.uint8)
        return cls(
            counter=int(d[0]) << 8 | int(d[1]),
            first_packet=int(d[2]) << 8 | int(d[3]),
            last_packet=int(d[4]) << 8 | int(d[5]),
            content=d[6:FRAME_SIZE].copy(),
        )


class RyfiCodec:
    """Frame bytes <-> QPSK symbol stream."""

    def __init__(self):
        self.rs = ReedSolomon(nroots=32, prim_poly=0x187, fcr=1, prim=1)
        self.conv_enc = ConvEncoder(CONV_K, CONV_POLYS)
        self.viterbi = ViterbiDecoder(CONV_K, CONV_POLYS)

    # -- TX ---------------------------------------------------------------
    def encode_frame(self, frame: Frame) -> np.ndarray:
        """Frame -> complex QPSK symbols (incl. sync)."""
        payload = frame.serialize()
        rs_out = np.concatenate([
            self.rs.encode(payload[i * RS_K : (i + 1) * RS_K])
            for i in range(RS_BLOCKS)
        ])
        scrambled = rs_out ^ SCRAMBLER
        bits = np.unpackbits(scrambled)
        coded = self.conv_enc.encode(bits)
        sync_bits = np.array(
            [(SYNC_WORD >> (SYNC_BITS - 1 - i)) & 1 for i in range(SYNC_BITS)],
            np.uint8,
        )
        all_bits = np.concatenate([sync_bits, coded])
        if len(all_bits) % 2:
            all_bits = np.append(all_bits, 0)
        # QPSK gray mapping: (b0, b1) -> ((1-2b0) + j(1-2b1)) / sqrt2
        b0 = all_bits[0::2].astype(np.float32)
        b1 = all_bits[1::2].astype(np.float32)
        return (
            ((1 - 2 * b0) + 1j * (1 - 2 * b1)) / np.sqrt(2.0)
        ).astype(np.complex64)

    # -- RX ---------------------------------------------------------------
    @staticmethod
    def symbols_to_bits(syms: np.ndarray) -> np.ndarray:
        bits = np.empty(syms.size * 2, np.uint8)
        bits[0::2] = (np.real(syms) < 0).astype(np.uint8)
        bits[1::2] = (np.imag(syms) < 0).astype(np.uint8)
        return bits

    def decode_bits(self, coded_bits: np.ndarray) -> tuple[Frame | None, int]:
        """Post-sync coded bits -> (frame, rs_errors_corrected|-1)."""
        soft = (1.0 - 2.0 * coded_bits[: ENC_FRAME_BYTES * 8 * 2].astype(np.float32))
        decoded = np.asarray(self.viterbi.decode(soft))[: ENC_FRAME_BYTES * 8]
        scrambled = np.packbits(decoded)
        rs_in = scrambled ^ SCRAMBLER
        out = np.zeros(FRAME_SIZE, np.uint8)
        total_err = 0
        for i in range(RS_BLOCKS):
            data, nerr = self.rs.decode(rs_in[i * RS_N : (i + 1) * RS_N])
            if nerr < 0:
                return None, -1
            total_err += nerr
            out[i * RS_K : (i + 1) * RS_K] = data
        return Frame.deserialize(out), total_err

    def frame_symbol_count(self) -> int:
        return (SYNC_BITS + ENC_FRAME_BYTES * 8 * 2 + 1) // 2


def find_sync(bits: np.ndarray, max_errors: int = 4) -> int:
    """Index of the sync word in a bit stream, or -1."""
    sync = np.array(
        [(SYNC_WORD >> (SYNC_BITS - 1 - i)) & 1 for i in range(SYNC_BITS)],
        np.int8,
    )
    b = np.asarray(bits, np.int8)
    if len(b) < SYNC_BITS:
        return -1
    # correlate via cumulative xor counting
    for i in range(len(b) - SYNC_BITS + 1):
        if np.count_nonzero(b[i : i + SYNC_BITS] != sync) <= max_errors:
            return i
    return -1


# -- packet layer ----------------------------------------------------------

def pack_packets(packets: list[bytes], counter: int = 0) -> Frame:
    """Pack length-prefixed packets into one frame (single-frame case)."""
    content = np.zeros(FRAME_DATA_SIZE, np.uint8)
    off = 0
    first = 0xFFFF
    last = 0xFFFF
    for p in packets:
        need = 2 + len(p)
        if off + need > FRAME_DATA_SIZE:
            break
        if first == 0xFFFF:
            first = off
        last = off
        content[off] = len(p) >> 8
        content[off + 1] = len(p) & 0xFF
        content[off + 2 : off + 2 + len(p)] = np.frombuffer(p, np.uint8)
        off += need
    return Frame(counter, first, last, content)


def unpack_packets(frame: Frame) -> list[bytes]:
    out = []
    if frame.first_packet == 0xFFFF:
        return out
    off = frame.first_packet
    while off + 2 <= FRAME_DATA_SIZE:
        ln = int(frame.content[off]) << 8 | int(frame.content[off + 1])
        if ln == 0 or off + 2 + ln > FRAME_DATA_SIZE:
            break
        out.append(bytes(frame.content[off + 2 : off + 2 + ln]))
        if off == frame.last_packet:
            break
        off += 2 + ln
    return out
