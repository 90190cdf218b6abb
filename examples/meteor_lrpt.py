"""Meteor-M2 LRPT digital chain: RF IQ -> QPSK demod -> soft symbols ->
Viterbi+Reed-Solomon deframe -> payload bytes (BASELINE config 4).

Synthesizes an LRPT-like burst (72 ksym QPSK at 150 ksps, RRC beta=0.6 —
the reference's meteor_demodulator parameters), pushes it through the
full receive stack, and prints the frame recovery stats.  Point the
``soft_out`` path at a real capture's output to write reference-parity
``.s`` soft-symbol files.
"""

import sys

import numpy as np
import scipy.signal as sig

from sdrtpu.graph.compile import CompiledOp, to_numpy
from sdrtpu.decoders.ccsds import (
    CVCDU_BYTES,
    CcsdsEncoder,
    deframe_qpsk_symbols,
)
from sdrtpu.io.symbols import SoftSymbolWriter, read_soft_file
from sdrtpu.kernels.psk import MeteorDemod
from sdrtpu.kernels import taps as tapsmod


def main() -> int:
    rng = np.random.default_rng(99)
    payload = [
        rng.integers(0, 256, CVCDU_BYTES).astype(np.uint8) for _ in range(3)
    ]
    soft_bits = CcsdsEncoder().encode(payload)
    syms = (soft_bits[0::2] + 1j * soft_bits[1::2]) / np.sqrt(2)
    preamble = np.exp(1j * (rng.integers(0, 4, 3000) * np.pi / 2 + np.pi / 4))
    tx = np.concatenate([preamble, syms])

    # pulse-shape to 150 ksps (sps = 25/12), RRC beta=0.6
    up = np.zeros(len(tx) * 25, np.complex128)
    up[::25] = tx
    h = tapsmod.root_raised_cosine_rate(251, 0.6, 1.0, 25.0)
    x = sig.resample_poly(np.convolve(up, h, "same") * 25, 1, 12)
    # channel: static phase, 100 Hz CFO, AWGN
    fs, n = 150000.0, len(x)
    x = x * np.exp(1j * (0.7 + 2 * np.pi * 100.0 * np.arange(n) / fs))
    x = (x + 0.05 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
         ).astype(np.complex64)

    # CompiledOp jits the chain with real-planar boundaries (complex
    # arrays cannot cross the TPU host<->device boundary)
    demod = CompiledOp(MeteorDemod())  # RRC -> AGC -> Costas(4) -> M&M
    _, (out, valid) = demod(demod.init_state(), x)
    symbols = to_numpy(out)[np.asarray(valid)]
    print(f"{len(symbols)} QPSK symbols recovered from {n} IQ samples")

    with SoftSymbolWriter("/tmp/meteor_example.s") as w:  # reference .s (x84)
        w.write(symbols)
    frames, dec = deframe_qpsk_symbols(read_soft_file("/tmp/meteor_example.s"))
    matched = sum(
        any(np.array_equal(f, cv) for cv in payload) for f in frames
    )
    print(f"frames decoded: {len(frames)}, payload-exact: {matched}, "
          f"RS corrections per frame: {dec.rs_errors}")
    return 0 if matched >= 2 else 1


if __name__ == "__main__":
    sys.exit(main())
