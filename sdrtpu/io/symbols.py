"""Soft-symbol (.s) file IO — Meteor demodulator output parity.

The reference writes interleaved int8 soft symbols scaled by 84 and
clamped to [-127, 127] (``meteor_demodulator/src/main.cpp:193-224``).
"""

from __future__ import annotations

import numpy as np

SOFT_SCALE = 84.0


def quantize_soft(symbols: np.ndarray) -> np.ndarray:
    """complex symbols -> interleaved int8 (re, im) pairs, x84 clamp 127."""
    out = np.empty(symbols.size * 2, np.int8)
    out[0::2] = np.clip(np.round(symbols.real * SOFT_SCALE), -127, 127)
    out[1::2] = np.clip(np.round(symbols.imag * SOFT_SCALE), -127, 127)
    return out


def dequantize_soft(data: np.ndarray) -> np.ndarray:
    d = np.asarray(data, np.int8).astype(np.float32) / SOFT_SCALE
    return (d[0::2] + 1j * d[1::2]).astype(np.complex64)


class SoftSymbolWriter:
    """Streaming .s writer accepting masked symbol blocks."""

    def __init__(self, path: str):
        self._f = open(path, "wb")

    def write(self, symbols: np.ndarray, valid: np.ndarray | None = None):
        if valid is not None:
            symbols = symbols[np.asarray(valid, bool)]
        self._f.write(quantize_soft(np.asarray(symbols)).tobytes())

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def read_soft_file(path: str) -> np.ndarray:
    return dequantize_soft(np.fromfile(path, np.int8))
