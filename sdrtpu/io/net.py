"""Raw network IQ ingest and egress.

Parity targets:
- ``source_modules/network_source`` — TCP/UDP listener receiving raw
  interleaved IQ in u8 (offset-128), i16, or f32.
- ``misc_modules/iq_exporter`` — baseband/VFO IQ out over TCP (server or
  client) or UDP in i8/i16/i32/f32.
- ``sink_modules/network_sink`` — audio as int16 over TCP/UDP.

Plain blocking sockets with worker threads (the reference's ``utils/net``
model); these are the host edges feeding the device pipeline.
"""

from __future__ import annotations

import logging
import socket
import threading
import time
from collections import deque

import numpy as np

_FORMATS = {
    "u8": (np.uint8, 1.0 / 128.0, 128.0),
    "i8": (np.int8, 1.0 / 128.0, 0.0),
    "i16": (np.int16, 1.0 / 32768.0, 0.0),
    "i32": (np.int32, 1.0 / 2147483648.0, 0.0),
    "f32": (np.float32, 1.0, 0.0),
}


def iq_to_bytes(iq: np.ndarray, fmt: str = "i16") -> bytes:
    dtype, scale, offset = _FORMATS[fmt]
    inter = np.empty(iq.size * 2, np.float32)
    inter[0::2] = iq.real
    inter[1::2] = iq.imag
    if fmt == "f32":
        return inter.astype(np.float32).tobytes()
    lo, hi = (0, 255) if fmt == "u8" else (
        np.iinfo(dtype).min, np.iinfo(dtype).max
    )
    return np.clip(np.rint(inter / scale + offset), lo, hi).astype(dtype).tobytes()


def bytes_to_iq(data: bytes, fmt: str = "i16") -> np.ndarray:
    dtype, scale, offset = _FORMATS[fmt]
    x = np.frombuffer(data, dtype).astype(np.float32)
    x = (x - offset) * scale
    n = (len(x) // 2) * 2
    return (x[0:n:2] + 1j * x[1:n:2]).astype(np.complex64)


class IqExporter:
    """IQ egress over TCP (server/client) or UDP (``iq_exporter``)."""

    def __init__(self, mode: str, host: str, port: int, fmt: str = "i16"):
        assert mode in ("tcp-server", "tcp-client", "udp")
        self.mode = mode
        self.fmt = fmt
        self._lock = threading.Lock()
        self._conn = None
        if mode == "udp":
            self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            self._addr = (host, port)
        elif mode == "tcp-client":
            self._sock = socket.create_connection((host, port))
            self._conn = self._sock
        else:
            self._listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            self._listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            self._listener.bind((host, port))
            self._listener.listen(1)
            self._accept_thread = threading.Thread(
                target=self._accept_loop, daemon=True
            )
            self._accept_thread.start()

    def _accept_loop(self):
        while True:
            try:
                conn, _ = self._listener.accept()
            except OSError:
                return
            with self._lock:
                if self._conn is not None:
                    try:
                        self._conn.close()
                    except OSError:
                        pass
                self._conn = conn

    @property
    def port(self) -> int:
        if self.mode == "tcp-server":
            return self._listener.getsockname()[1]
        return self._sock.getsockname()[1]

    def send(self, iq: np.ndarray) -> None:
        data = iq_to_bytes(iq, self.fmt)
        if self.mode == "udp":
            # packetize under typical MTU-ish chunks
            for i in range(0, len(data), 1024):
                self._sock.sendto(data[i : i + 1024], self._addr)
            return
        with self._lock:
            conn = self._conn
        if conn is None:
            return  # no client yet — drop, like the reference
        try:
            conn.sendall(data)
        except OSError:
            with self._lock:
                if self._conn is conn:  # don't clobber a reconnect
                    self._conn = None

    def close(self):
        if self.mode == "tcp-server":
            self._listener.close()
        if self._conn is not None:
            self._conn.close()
        if self.mode == "udp":
            self._sock.close()


class NetworkSource:
    """Raw IQ ingest over TCP(listen) or UDP (``network_source``).

    Received samples accumulate in a deque; ``read()`` drains them.
    TCP connections use the native C++ ingest pump when available
    (``sdrtpu.native.NativeTcpPump``: GIL-free recv loop + SPSC ring,
    the analog of the reference's source worker threads); set
    ``native=False`` or lack the toolchain to use the pure-Python reader.
    """

    def __init__(self, mode: str, host: str, port: int, fmt: str = "i16",
                 native: bool = True):
        assert mode in ("tcp", "udp")
        self.mode = mode
        self.fmt = fmt
        self.native = native
        self._pump = None
        self._chunks: deque[np.ndarray] = deque()
        self._cv = threading.Condition()
        self._running = True
        if mode == "udp":
            self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            self._sock.bind((host, port))
        else:
            self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            self._sock.bind((host, port))
            self._sock.listen(1)
        self._thread = threading.Thread(target=self._rx_loop, daemon=True)
        self._thread.start()

    @property
    def port(self) -> int:
        return self._sock.getsockname()[1]

    def _push(self, data: bytes):
        if not data:
            return
        iq = bytes_to_iq(data, self.fmt)
        with self._cv:
            self._chunks.append(iq)
            self._cv.notify()

    def _rx_loop(self):
        itemsize = np.dtype(_FORMATS[self.fmt][0]).itemsize * 2
        if self.mode == "udp":
            while self._running:
                try:
                    data, _ = self._sock.recvfrom(65536)
                except OSError:
                    return
                # a truncated/malformed datagram must not kill the rx
                # thread: trim to whole samples (UDP has no carry — the
                # next datagram starts a fresh sample boundary)
                usable = (len(data) // itemsize) * itemsize
                if usable:
                    self._push(data[:usable])
        else:
            while self._running:
                try:
                    conn, _ = self._sock.accept()
                except OSError:
                    return
                if self.native and self._try_pump(conn):
                    continue
                buf = b""
                while self._running:
                    try:
                        data = conn.recv(65536)
                    except OSError:
                        break
                    if not data:
                        break
                    buf += data
                    usable = (len(buf) // itemsize) * itemsize
                    if usable:
                        self._push(buf[:usable])
                        buf = buf[usable:]

    def _try_pump(self, conn) -> bool:
        """Drain one connection through the native pump.

        Returns False only when the native library is unavailable (the
        caller's pure-Python reader then handles ``conn``).  If pump
        construction fails AFTER the socket fd was detached, the
        connection is unrecoverable — log and report handled (True)
        rather than letting the fallback recv() a dead socket.
        """
        try:
            from ..native import NativeTcpPump, get_lib
        except ImportError:
            return False
        if get_lib() is None:
            return False
        try:
            pump = NativeTcpPump(conn, fmt=self.fmt)  # detaches conn's fd
        except (RuntimeError, OSError):
            logging.getLogger(__name__).error(
                "native ingest pump failed after socket detach; "
                "connection dropped"
            )
            return True
        self._pump = pump
        try:
            while self._running:
                re, im = pump.read_planar(1 << 18)
                if len(re):
                    iq = np.empty(len(re), np.complex64)
                    iq.real = re
                    iq.imag = im
                    with self._cv:
                        self._chunks.append(iq)
                        self._cv.notify()
                elif pump.state != "running":
                    break
                else:
                    time.sleep(0.002)
        finally:
            pump.close()
            self._pump = None
        return True

    def read(self, timeout: float = 1.0) -> np.ndarray | None:
        with self._cv:
            if not self._chunks:
                self._cv.wait(timeout)
            if not self._chunks:
                return None
            out = np.concatenate(list(self._chunks))
            self._chunks.clear()
            return out

    def close(self):
        self._running = False
        try:
            self._sock.close()
        except OSError:
            pass
