"""CCSDS concatenated-code deframer (Meteor LRPT / falcon9-style links).

Completes the Meteor M2 LRPT chain past the demodulator (BASELINE
config 4) and covers the falcon9_decoder's FEC layer: the downlink uses
the standard CCSDS stack —

    QPSK soft symbols
      -> rate-1/2 K=7 convolutional code (polys 0o171/0o133) -> Viterbi
      -> attached sync marker 0x1ACFFC1D on 1024-byte frames
      -> derandomizer (CCSDS PRBS x^8+x^7+x^5+x^3+1, all-ones init)
      -> Reed-Solomon (255,223) interleave depth 4 -> 892-byte CVCDU

All bit plumbing is NumPy (frame rates are low); the Viterbi runs on
sdrtpu's vectorized trellis (`fec/viterbi.py`).
"""

from __future__ import annotations

import numpy as np

from ..fec.reed_solomon import ReedSolomon
from ..fec.viterbi import ConvEncoder, ViterbiDecoder

ASM = 0x1ACFFC1D
ASM_BITS = np.array([(ASM >> (31 - i)) & 1 for i in range(32)], np.uint8)
FRAME_BYTES = 1024           # ASM-framed codeblock (after the 4-byte ASM)
RS_INTERLEAVE = 4
RS_N, RS_K = 255, 223
CVCDU_BYTES = RS_K * RS_INTERLEAVE  # 892
CONV_POLYS = (0o171, 0o133)


def ccsds_randomizer(n_bytes: int) -> np.ndarray:
    """CCSDS pseudo-randomizer sequence (x^8+x^7+x^5+x^3+1, init 0xFF).

    255-bit-periodic; the standard sequence begins
    ``ff 48 0e c0 9a 0d 70 bc`` (CCSDS 131.0-B).  MSB-first output from
    a Fibonacci LFSR whose feedback taps for this polynomial are bits
    7, 4, 2, 0 of the shift register.
    """
    reg = 0xFF
    out = np.empty(n_bytes, np.uint8)
    for i in range(n_bytes):
        b = 0
        for _ in range(8):
            fb = ((reg >> 7) ^ (reg >> 4) ^ (reg >> 2) ^ reg) & 1
            b = (b << 1) | ((reg >> 7) & 1)
            reg = ((reg << 1) | fb) & 0xFF
        out[i] = b
    return out


_RAND = None


def _randomizer() -> np.ndarray:
    global _RAND
    if _RAND is None:
        _RAND = ccsds_randomizer(FRAME_BYTES)
    return _RAND


def rs_interleave_encode(data: np.ndarray, rs: ReedSolomon) -> np.ndarray:
    """(892,) CVCDU bytes -> (1020,) RS codeblock, interleave depth 4."""
    d = np.asarray(data, np.uint8).reshape(RS_K, RS_INTERLEAVE)
    blocks = [rs.encode(d[:, i]) for i in range(RS_INTERLEAVE)]
    out = np.empty((RS_N, RS_INTERLEAVE), np.uint8)
    for i, b in enumerate(blocks):
        out[:, i] = b
    return out.reshape(-1)


def rs_interleave_decode(code: np.ndarray, rs: ReedSolomon):
    c = np.asarray(code, np.uint8).reshape(RS_N, RS_INTERLEAVE)
    out = np.empty((RS_K, RS_INTERLEAVE), np.uint8)
    total = 0
    for i in range(RS_INTERLEAVE):
        data, nerr = rs.decode(c[:, i])
        if nerr < 0:
            return None, -1
        total += nerr
        out[:, i] = data
    return out.reshape(-1), total


class CcsdsEncoder:
    """Frame bytes -> soft QPSK symbols (tests / tx)."""

    def __init__(self):
        self.rs = ReedSolomon(nroots=32, prim_poly=0x187, fcr=112, prim=11)
        self.conv = ConvEncoder(7, CONV_POLYS)

    def encode(self, cvcdus: list[np.ndarray]) -> np.ndarray:
        bits = []
        for cv in cvcdus:
            code = rs_interleave_encode(cv, self.rs)
            # pad codeblock to FRAME_BYTES with zeros (1020 -> 1024)
            frame = np.zeros(FRAME_BYTES, np.uint8)
            frame[: len(code)] = code
            frame ^= _randomizer()
            bits.append(ASM_BITS)
            bits.append(np.unpackbits(frame))
        all_bits = np.concatenate(bits)
        coded = self.conv.encode(all_bits)
        # soft symbols: bit 0 -> +1
        return (1.0 - 2.0 * coded.astype(np.float32))


class CcsdsDeframer:
    """Soft channel symbols -> CVCDU frames with RS statistics.

    Streaming: unconsumed tail symbols/bits are carried across calls
    (bounded), so frames straddling a `process()` boundary are not lost
    — the carried soft symbols are re-run through the Viterbi together
    with the next block, which also heals the trellis seam.
    """

    _FRAME_BITS = 32 + FRAME_BYTES * 8
    _MAX_TAIL_BITS = 2 * _FRAME_BITS  # bound the re-decoded carry

    def __init__(self):
        self.rs = ReedSolomon(nroots=32, prim_poly=0x187, fcr=112, prim=11)
        self.viterbi = ViterbiDecoder(7, CONV_POLYS)
        self.frames: list[np.ndarray] = []
        self.rs_errors: list[int] = []
        self._soft_tail = np.zeros(0, np.float32)
        self._bit_tail = np.zeros(0, np.uint8)

    def process(self, soft: np.ndarray) -> list[np.ndarray]:
        """Decode a block of soft symbols; returns new CVCDUs."""
        soft = np.concatenate(
            [self._soft_tail, np.asarray(soft, np.float32)]
        )
        decoded = np.asarray(self.viterbi.decode(soft))
        new, consumed = self._scan(decoded)
        tail = soft[2 * consumed:]
        self._soft_tail = tail[-2 * self._MAX_TAIL_BITS:]
        return new

    def process_bits(self, bits: np.ndarray) -> list[np.ndarray]:
        """Decode a block of hard bits (post-Viterbi input path)."""
        bits = np.concatenate([self._bit_tail, np.asarray(bits, np.uint8)])
        new, consumed = self._scan(bits)
        self._bit_tail = bits[consumed:][-self._MAX_TAIL_BITS:]
        return new

    def _scan(self, bits: np.ndarray) -> tuple[list[np.ndarray], int]:
        new = []
        frame_bits = self._FRAME_BITS
        i = 0
        while i + frame_bits <= len(bits):
            w = bits[i : i + 32]
            inv = np.count_nonzero(w != ASM_BITS)
            if inv <= 3 or inv >= 29:  # direct or inverted sync
                fb = bits[i + 32 : i + frame_bits]
                if inv >= 29:
                    fb = fb ^ 1
                frame = np.packbits(fb) ^ _randomizer()
                data, nerr = rs_interleave_decode(frame[: RS_N * RS_INTERLEAVE], self.rs)
                if data is not None:
                    new.append(data)
                    self.frames.append(data)
                    self.rs_errors.append(nerr)
                i += frame_bits
            else:
                i += 1
        return new, i


def deframe_qpsk_symbols(symbols: np.ndarray, deframer: CcsdsDeframer | None = None):
    """Resolve the QPSK lock ambiguity and deframe complex soft symbols.

    A 4th-order Costas loop (`kernels/psk.py` `MeteorDemod`) locks at any
    of 4 rotations; the ASM search in `CcsdsDeframer` absorbs the 180°
    pair (inverted sync), so two candidate streams remain: direct
    (I=even bits, Q=odd) and the 90° rotation (I/Q swapped, one branch
    negated).  Try both and return frames from whichever syncs — the
    receiver-side completion of the reference chain, whose `.s` files are
    resolved by the downstream LRPT image decoder instead
    (``decoder_modules/meteor_demodulator/src/main.cpp:193-224``).

    Returns (frames, deframer) — the deframer keeps RS statistics.
    """
    if deframer is None:
        deframer = QpskAmbiguityResolver()
    return deframer.process(symbols), deframer


class QpskAmbiguityResolver:
    """Streaming 90-degree-ambiguity resolver over two `CcsdsDeframer`s.

    Both rotation candidates keep their OWN streaming state (soft tails),
    so frames straddling `process()` calls survive — a single deframer
    fed alternating rotations would poison its carry with symbols from
    the other phase and never sync on chunked input.  Once one phase
    produces a frame the resolver locks to it (the other candidate is
    dropped; a Costas re-lock to a new rotation mid-pass is a stream
    restart in the reference too).
    """

    def __init__(self):
        self._cands = [CcsdsDeframer(), CcsdsDeframer()]
        self.locked: int | None = None

    @property
    def deframer(self) -> CcsdsDeframer:
        """The active deframer (frames / rs_errors statistics)."""
        return self._cands[self.locked if self.locked is not None else 0]

    @property
    def frames(self) -> list[np.ndarray]:
        return self.deframer.frames

    @property
    def rs_errors(self) -> list[int]:
        return self.deframer.rs_errors

    def process(self, symbols: np.ndarray) -> list[np.ndarray]:
        symbols = np.asarray(symbols)
        ks = (self.locked,) if self.locked is not None else (0, 1)
        new: list[np.ndarray] = []
        for k in ks:
            rot = symbols if k == 0 else symbols * np.complex64(-1j)
            soft = np.empty(2 * len(rot), np.float32)
            soft[0::2] = rot.real
            soft[1::2] = rot.imag
            frames = self._cands[k].process(soft)
            new += frames
            if frames and self.locked is None:
                self.locked = k
                self._cands[1 - k] = self._cands[k]  # free the loser
                # stop immediately: running the other rotation through the
                # (now aliased) locked deframer would corrupt its streaming
                # soft tail and drop frames straddling this call
                break
        return new
