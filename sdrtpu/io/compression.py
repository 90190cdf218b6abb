"""Sample stream compression — SDR++ server wire format parity.

Format (``core/src/dsp/compression/sample_stream_compressor.h:30-64``):

    u16 compression_type (0)
    u16 sample_type      (0=i8, 1=i16, 2=f32; ``pcm_type.h``)
    f32 scaler           (max |component|; 0 for f32)
    payload              (interleaved I/Q samples)

The int paths scale by 128/max or 32768/max (matching VOLK's convert
kernels, which saturate).  Optional zstd (level 1, ``server.cpp:235``) is
applied to the whole packet when the ``zstandard`` module is available;
otherwise compression stays off (the protocol flag says which).
"""

from __future__ import annotations

import struct

import numpy as np

try:  # optional, matches the reference's optional zstd path
    import zstandard as _zstd

    HAVE_ZSTD = True
except ImportError:  # pragma: no cover
    _zstd = None
    HAVE_ZSTD = False

PCM_TYPE_I8 = 0
PCM_TYPE_I16 = 1
PCM_TYPE_F32 = 2


def compress(iq: np.ndarray, pcm_type: int = PCM_TYPE_I16) -> bytes:
    """complex64 IQ -> wire payload with scale header."""
    interleaved = np.empty(iq.size * 2, np.float32)
    interleaved[0::2] = iq.real
    interleaved[1::2] = iq.imag
    if pcm_type == PCM_TYPE_F32:
        return struct.pack("<HHf", 0, PCM_TYPE_F32, 0.0) + interleaved.tobytes()
    max_val = float(interleaved[np.argmax(interleaved)]) if iq.size else 1.0
    if max_val == 0.0:
        max_val = 1.0
    hdr = struct.pack("<HHf", 0, pcm_type, max_val)
    if pcm_type == PCM_TYPE_I8:
        data = np.clip(
            np.rint(interleaved * (128.0 / max_val)), -128, 127
        ).astype(np.int8)
    else:
        data = np.clip(
            np.rint(interleaved * (32768.0 / max_val)), -32768, 32767
        ).astype(np.int16)
    return hdr + data.tobytes()


def decompress(payload: bytes) -> np.ndarray:
    """Wire payload -> complex64 IQ (``sample_stream_decompressor.h``)."""
    _, sample_type, scaler = struct.unpack("<HHf", payload[:8])
    raw = payload[8:]
    if sample_type == PCM_TYPE_F32:
        x = np.frombuffer(raw, np.float32)
    elif sample_type == PCM_TYPE_I8:
        x = np.frombuffer(raw, np.int8).astype(np.float32) * (scaler / 128.0)
    elif sample_type == PCM_TYPE_I16:
        x = np.frombuffer(raw, np.int16).astype(np.float32) * (scaler / 32768.0)
    else:
        raise ValueError(f"unknown sample type {sample_type}")
    return (x[0::2] + 1j * x[1::2]).astype(np.complex64)


def zstd_compress(data: bytes, level: int = 1) -> bytes:
    if not HAVE_ZSTD:
        raise RuntimeError("zstandard module not available")
    return _zstd.ZstdCompressor(level=level).compress(data)


def zstd_decompress(data: bytes) -> bytes:
    if not HAVE_ZSTD:
        raise RuntimeError("zstandard module not available")
    return _zstd.ZstdDecompressor().decompress(data)
