"""Native host-side IO library (C++, ctypes-bound).

Provides the hot host-edge operations as a compiled shared library —
the analog of the reference's VOLK-converted ingest loops and
``SampleFrameBuffer``:

- `convert_to_planar(data, fmt)` — interleaved u8/i8/i16/i32/f32 wire IQ
  -> planar (re, im) float32, the TPU boundary layout.
- `convert_from_planar(re, im, fmt)` — the reverse for egress.
- `SpscRing` — lock-free single-producer single-consumer byte ring.

The library builds on first use (g++ -O3); every entry point has a NumPy
fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SO_PATH = os.path.join(_HERE, "libsdrtpu_native.so")
_SOURCES = ["iqconvert.cpp", "ringbuffer.cpp", "ingest.cpp"]

_lib = None
_lib_lock = threading.Lock()


def _build() -> str | None:
    srcs = [os.path.join(_HERE, "src", s) for s in _SOURCES]
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        *srcs, "-o", _SO_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _SO_PATH
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib or None
        path = _SO_PATH if os.path.exists(_SO_PATH) else _build()
        if path is None:
            _lib = False
            return None
        try:
            lib = ctypes.CDLL(path)
            _bind(lib)
        except (OSError, AttributeError):
            # a stale .so (built before a symbol was added) dlopens fine
            # but fails symbol binding: rebuild once, else degrade to the
            # NumPy fallbacks rather than crash
            try:
                if _build() is None:
                    raise OSError("rebuild failed")
                lib = ctypes.CDLL(_SO_PATH)
                _bind(lib)
            except (OSError, AttributeError):
                _lib = False
                return None
        _lib = lib
        return lib


def _bind(lib) -> None:
    c_i64 = ctypes.c_int64
    p = ctypes.POINTER
    for name, arg0 in [
        ("iq_u8_to_planar_f32", ctypes.c_uint8),
        ("iq_i8_to_planar_f32", ctypes.c_int8),
        ("iq_i16_to_planar_f32", ctypes.c_int16),
        ("iq_i32_to_planar_f32", ctypes.c_int32),
        ("iq_f32_to_planar_f32", ctypes.c_float),
    ]:
        f = getattr(lib, name)
        f.argtypes = [p(arg0), p(ctypes.c_float), p(ctypes.c_float), c_i64]
        f.restype = None
    for name, outt in [
        ("planar_f32_to_iq_i8", ctypes.c_int8),
        ("planar_f32_to_iq_i16", ctypes.c_int16),
        ("planar_f32_to_iq_f32", ctypes.c_float),
    ]:
        f = getattr(lib, name)
        f.argtypes = [p(ctypes.c_float), p(ctypes.c_float), p(outt), c_i64]
        f.restype = None
    lib.ring_create.argtypes = [c_i64]
    lib.ring_create.restype = ctypes.c_void_p
    lib.ring_destroy.argtypes = [ctypes.c_void_p]
    for name in ("ring_write_available", "ring_read_available"):
        f = getattr(lib, name)
        f.argtypes = [ctypes.c_void_p]
        f.restype = c_i64
    lib.ring_write.argtypes = [ctypes.c_void_p, p(ctypes.c_uint8), c_i64]
    lib.ring_write.restype = c_i64
    lib.ring_read.argtypes = [ctypes.c_void_p, p(ctypes.c_uint8), c_i64]
    lib.ring_read.restype = c_i64
    lib.pump_create.argtypes = [ctypes.c_int, c_i64, c_i64]
    lib.pump_create.restype = ctypes.c_void_p
    lib.pump_read.argtypes = [ctypes.c_void_p, p(ctypes.c_uint8), c_i64]
    lib.pump_read.restype = c_i64
    for name in ("pump_available", "pump_total_bytes", "pump_dropped_bytes"):
        f = getattr(lib, name)
        f.argtypes = [ctypes.c_void_p]
        f.restype = c_i64
    lib.pump_state.argtypes = [ctypes.c_void_p]
    lib.pump_state.restype = ctypes.c_int
    lib.pump_destroy.argtypes = [ctypes.c_void_p]
    lib.pump_destroy.restype = None


_DTYPES = {
    "u8": (np.uint8, "iq_u8_to_planar_f32", ctypes.c_uint8),
    "i8": (np.int8, "iq_i8_to_planar_f32", ctypes.c_int8),
    "i16": (np.int16, "iq_i16_to_planar_f32", ctypes.c_int16),
    "i32": (np.int32, "iq_i32_to_planar_f32", ctypes.c_int32),
    "f32": (np.float32, "iq_f32_to_planar_f32", ctypes.c_float),
}
_SCALES = {"u8": 128.0, "i8": 128.0, "i16": 32768.0, "i32": 2147483648.0}


def convert_to_planar(data: bytes | np.ndarray, fmt: str):
    """Interleaved wire IQ -> planar (re, im) float32 arrays."""
    dtype, fname, ctype = _DTYPES[fmt]
    raw = np.frombuffer(data, dtype) if isinstance(data, bytes) else np.asarray(data, dtype)
    n = len(raw) // 2
    re = np.empty(n, np.float32)
    im = np.empty(n, np.float32)
    lib = get_lib()
    if lib is not None:
        raw = np.ascontiguousarray(raw[: n * 2])
        getattr(lib, fname)(
            raw.ctypes.data_as(ctypes.POINTER(ctype)),
            re.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            im.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n,
        )
        return re, im
    # NumPy fallback
    x = raw[: n * 2].astype(np.float32)
    if fmt == "u8":
        x = x - 128.0
    if fmt in _SCALES:
        x = x / _SCALES[fmt]
    return np.ascontiguousarray(x[0::2]), np.ascontiguousarray(x[1::2])


def convert_from_planar(re: np.ndarray, im: np.ndarray, fmt: str) -> np.ndarray:
    """Planar float32 -> interleaved wire IQ array."""
    n = len(re)
    lib = get_lib()
    if fmt == "f32":
        out = np.empty(n * 2, np.float32)
        if lib is not None:
            lib.planar_f32_to_iq_f32(
                np.ascontiguousarray(re, np.float32).ctypes.data_as(
                    ctypes.POINTER(ctypes.c_float)
                ),
                np.ascontiguousarray(im, np.float32).ctypes.data_as(
                    ctypes.POINTER(ctypes.c_float)
                ),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                n,
            )
            return out
        out[0::2] = re
        out[1::2] = im
        return out
    assert fmt in ("i8", "i16")
    ctype = ctypes.c_int8 if fmt == "i8" else ctypes.c_int16
    dtype = np.int8 if fmt == "i8" else np.int16
    out = np.empty(n * 2, dtype)
    if lib is not None:
        fn = lib.planar_f32_to_iq_i8 if fmt == "i8" else lib.planar_f32_to_iq_i16
        fn(
            np.ascontiguousarray(re, np.float32).ctypes.data_as(
                ctypes.POINTER(ctypes.c_float)
            ),
            np.ascontiguousarray(im, np.float32).ctypes.data_as(
                ctypes.POINTER(ctypes.c_float)
            ),
            out.ctypes.data_as(ctypes.POINTER(ctype)),
            n,
        )
        return out
    scale = _SCALES[fmt]
    lo, hi = np.iinfo(dtype).min, np.iinfo(dtype).max
    out[0::2] = np.clip(re * scale, lo, hi)
    out[1::2] = np.clip(im * scale, lo, hi)
    return out


class SpscRing:
    """Lock-free byte ring (native; falls back to a Python deque-free shim)."""

    def __init__(self, capacity: int):
        self._lib = get_lib()
        if self._lib is not None:
            self._handle = self._lib.ring_create(capacity)
            if not self._handle:
                raise MemoryError("ring_create failed")
            self._buf = None
        else:  # degenerate numpy fallback (single-threaded use)
            self._handle = None
            self._buf = bytearray()
            self._cap = capacity

    def write(self, data: bytes | np.ndarray) -> int:
        data = np.frombuffer(data, np.uint8) if isinstance(data, (bytes, bytearray)) else np.asarray(data, np.uint8)
        if self._handle:
            return int(
                self._lib.ring_write(
                    self._handle,
                    np.ascontiguousarray(data).ctypes.data_as(
                        ctypes.POINTER(ctypes.c_uint8)
                    ),
                    len(data),
                )
            )
        take = min(len(data), self._cap - len(self._buf))
        self._buf += bytes(data[:take])
        return take

    def read(self, n: int) -> bytes:
        if self._handle:
            out = np.empty(n, np.uint8)
            got = int(
                self._lib.ring_read(
                    self._handle,
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    n,
                )
            )
            return out[:got].tobytes()
        got = bytes(self._buf[:n])
        del self._buf[: len(got)]
        return got

    @property
    def readable(self) -> int:
        if self._handle:
            return int(self._lib.ring_read_available(self._handle))
        return len(self._buf)

    def close(self):
        if self._handle:
            self._lib.ring_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeTcpPump:
    """C++ reader thread draining a connected TCP socket into the ring.

    The native analog of a reference source module's worker thread
    (``source_modules/network_source``, ``rtl_tcp_source`` read loops):
    recv() runs in C++ (no GIL), overruns are dropped-and-counted like
    ``SampleFrameBuffer``.  Python fetches whole IQ blocks and converts
    them planar with the iqconvert kernels.

    Takes ownership of ``sock`` (the fd is detached).  Raises RuntimeError
    if the native library is unavailable — callers fall back to the
    pure-Python reader (`sdrtpu.io.net.NetworkSource`).
    """

    def __init__(self, sock, fmt: str = "i16", ring_bytes: int = 1 << 24):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self.fmt = fmt
        self._itemsize = np.dtype(_DTYPES[fmt][0]).itemsize * 2
        fd = sock.detach()
        self._handle = lib.pump_create(fd, ring_bytes, self._itemsize)
        if not self._handle:  # pump_create closed the fd on failure
            raise RuntimeError("pump_create failed")

    @property
    def available_samples(self) -> int:
        return int(self._lib.pump_available(self._handle)) // self._itemsize

    @property
    def state(self) -> str:
        return {0: "running", 1: "eof", 2: "error"}[
            int(self._lib.pump_state(self._handle))
        ]

    @property
    def total_bytes(self) -> int:
        return int(self._lib.pump_total_bytes(self._handle))

    @property
    def dropped_bytes(self) -> int:
        return int(self._lib.pump_dropped_bytes(self._handle))

    def read_planar(self, n_samples: int):
        """Up to ``n_samples`` IQ samples -> planar (re, im) float32.

        Reads only whole samples: bytes are never dequeued from the ring
        and then discarded (that would shift the I/Q framing of the whole
        remaining stream).  The producer only adds bytes between the
        availability check and the read, so the aligned read always gets
        exactly what it asks for.
        """
        want = min(n_samples, self.available_samples) * self._itemsize
        if want == 0:
            return (np.empty(0, np.float32), np.empty(0, np.float32))
        buf = np.empty(want, np.uint8)
        got = int(
            self._lib.pump_read(
                self._handle,
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                want,
            )
        )
        assert got == want, (got, want)
        # reinterpret in place (no tobytes copy); view matches the wire dtype
        return convert_to_planar(buf.view(_DTYPES[self.fmt][0]), self.fmt)

    def close(self):
        if self._handle:
            self._lib.pump_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
