"""SDR++ server protocol: headless baseband server + client.

Wire format parity with ``core/src/server_protocol.h:9-52`` and the server
loop in ``core/src/server.cpp``:

    PacketHeader  { u32 type; u32 size; }   (size includes the header)
    CommandHeader { u32 cmd; }

Packet types and commands mirror the reference enums, so this server can
feed an actual SDR++ ``sdrpp_server_source`` client with baseband (modulo
the SmGui remote-UI blob, which we answer with an empty UI).

The server streams PCM-scale-compressed baseband (``compression.py``)
optionally wrapped in zstd, exactly like ``server.cpp:232-246``.
"""

from __future__ import annotations

import socket
import struct
import threading

import numpy as np

from . import compression

# PacketType (server_protocol.h)
PKT_COMMAND = 0
PKT_COMMAND_ACK = 1
PKT_BASEBAND = 2
PKT_BASEBAND_COMPRESSED = 3
PKT_VFO = 4
PKT_FFT = 5
PKT_ERROR = 6

# Command
CMD_GET_UI = 0x00
CMD_UI_ACTION = 0x01
CMD_START = 0x02
CMD_STOP = 0x03
CMD_SET_FREQUENCY = 0x04
CMD_GET_SAMPLERATE = 0x05
CMD_SET_SAMPLE_TYPE = 0x06
CMD_SET_COMPRESSION = 0x07
CMD_SET_SAMPLERATE = 0x80
CMD_DISCONNECT = 0x81

_HDR = struct.Struct("<II")


def write_packet(sock: socket.socket, ptype: int, payload: bytes = b"") -> None:
    sock.sendall(_HDR.pack(ptype, _HDR.size + len(payload)) + payload)


def read_packet(sock: socket.socket) -> tuple[int, bytes] | None:
    hdr = _recv_exact(sock, _HDR.size)
    if hdr is None:
        return None
    ptype, size = _HDR.unpack(hdr)
    payload = _recv_exact(sock, size - _HDR.size)
    if payload is None:
        return None
    return ptype, payload


def _recv_exact(sock: socket.socket, n: int) -> bytes | None:
    buf = b""
    while len(buf) < n:
        try:
            chunk = sock.recv(n - len(buf))
        except OSError:
            return None
        if not chunk:
            return None
        buf += chunk
    return buf


class SdrppServer:
    """Single-client baseband server (``server::main`` behavior).

    ``tune_callback(freq)`` and ``start/stop_callback()`` hook the radio
    control plane; call ``send_baseband(iq)`` from the streaming loop while
    running.
    """

    def __init__(
        self,
        host: str = "0.0.0.0",
        port: int = 5259,
        samplerate: float = 1_000_000.0,
        tune_callback=None,
        start_callback=None,
        stop_callback=None,
    ):
        self.samplerate = samplerate
        self.tune_callback = tune_callback
        self.start_callback = start_callback
        self.stop_callback = stop_callback
        self.running = False
        self.sample_type = compression.PCM_TYPE_I16
        self.use_compression = False
        self._client: socket.socket | None = None
        self._lock = threading.Lock()
        self._listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._listener.bind((host, port))
        self._listener.listen(1)
        self._alive = True
        self._thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._thread.start()

    @property
    def port(self) -> int:
        return self._listener.getsockname()[1]

    def _accept_loop(self):
        while self._alive:
            try:
                conn, _ = self._listener.accept()
            except OSError:
                return
            with self._lock:
                if self._client is not None:
                    # reject second client (server.cpp:165-186)
                    conn.close()
                    continue
                self._client = conn
            t = threading.Thread(target=self._client_loop, args=(conn,), daemon=True)
            t.start()

    def _client_loop(self, conn: socket.socket):
        while self._alive:
            pkt = read_packet(conn)
            if pkt is None:
                break
            ptype, payload = pkt
            if ptype != PKT_COMMAND or len(payload) < 4:
                write_packet(conn, PKT_ERROR, struct.pack("<I", 1))
                continue
            (cmd,) = struct.unpack("<I", payload[:4])
            args = payload[4:]
            self._handle_command(conn, cmd, args)
        with self._lock:
            if self._client is conn:
                self._client = None
        conn.close()

    def _handle_command(self, conn, cmd, args):
        if cmd == CMD_GET_UI:
            write_packet(conn, PKT_COMMAND_ACK, struct.pack("<I", CMD_GET_UI))
        elif cmd == CMD_START:
            self.running = True
            if self.start_callback:
                self.start_callback()
            write_packet(conn, PKT_COMMAND_ACK, struct.pack("<I", CMD_START))
        elif cmd == CMD_STOP:
            self.running = False
            if self.stop_callback:
                self.stop_callback()
            write_packet(conn, PKT_COMMAND_ACK, struct.pack("<I", CMD_STOP))
        elif cmd == CMD_SET_FREQUENCY and len(args) >= 8:
            (freq,) = struct.unpack("<d", args[:8])
            if self.tune_callback:
                self.tune_callback(freq)
            write_packet(conn, PKT_COMMAND_ACK, struct.pack("<I", CMD_SET_FREQUENCY))
        elif cmd == CMD_GET_SAMPLERATE:
            write_packet(
                conn,
                PKT_COMMAND_ACK,
                struct.pack("<Id", CMD_SET_SAMPLERATE, self.samplerate),
            )
        elif cmd == CMD_SET_SAMPLE_TYPE and len(args) >= 4:
            (self.sample_type,) = struct.unpack("<I", args[:4])
            write_packet(conn, PKT_COMMAND_ACK, struct.pack("<I", CMD_SET_SAMPLE_TYPE))
        elif cmd == CMD_SET_COMPRESSION and len(args) >= 4:
            (flag,) = struct.unpack("<I", args[:4])
            self.use_compression = bool(flag) and compression.HAVE_ZSTD
            write_packet(conn, PKT_COMMAND_ACK, struct.pack("<I", CMD_SET_COMPRESSION))
        else:
            write_packet(conn, PKT_ERROR, struct.pack("<I", 2))

    def send_baseband(self, iq: np.ndarray) -> None:
        with self._lock:
            conn = self._client
        if conn is None or not self.running:
            return
        payload = compression.compress(iq, self.sample_type)
        if self.use_compression:
            payload = compression.zstd_compress(payload, 1)
            ptype = PKT_BASEBAND_COMPRESSED
        else:
            ptype = PKT_BASEBAND
        try:
            write_packet(conn, ptype, payload)
        except OSError:
            with self._lock:
                self._client = None

    def close(self):
        self._alive = False
        self._listener.close()
        with self._lock:
            if self._client:
                self._client.close()


class SdrppClient:
    """Client of the server protocol (``sdrpp_server_source`` parity)."""

    def __init__(self, host: str, port: int):
        self._sock = socket.create_connection((host, port))

    def _command(self, cmd: int, args: bytes = b"") -> None:
        write_packet(self._sock, PKT_COMMAND, struct.pack("<I", cmd) + args)

    def start(self):
        self._command(CMD_START)

    def stop(self):
        self._command(CMD_STOP)

    def set_frequency(self, freq: float):
        self._command(CMD_SET_FREQUENCY, struct.pack("<d", freq))

    def set_sample_type(self, pcm_type: int):
        self._command(CMD_SET_SAMPLE_TYPE, struct.pack("<I", pcm_type))

    def set_compression(self, enabled: bool):
        self._command(CMD_SET_COMPRESSION, struct.pack("<I", int(enabled)))

    def get_samplerate(self) -> float:
        self._command(CMD_GET_SAMPLERATE)
        while True:
            pkt = read_packet(self._sock)
            if pkt is None:
                raise ConnectionError("server closed")
            ptype, payload = pkt
            if ptype == PKT_COMMAND_ACK and len(payload) >= 12:
                cmd, value = struct.unpack("<Id", payload[:12])
                if cmd == CMD_SET_SAMPLERATE:
                    return value

    def recv(self) -> tuple[int, bytes] | None:
        return read_packet(self._sock)

    def recv_baseband(self, timeout: float = 5.0) -> np.ndarray | None:
        self._sock.settimeout(timeout)
        try:
            while True:
                pkt = read_packet(self._sock)
                if pkt is None:
                    return None
                ptype, payload = pkt
                if ptype == PKT_BASEBAND:
                    return compression.decompress(payload)
                if ptype == PKT_BASEBAND_COMPRESSED:
                    return compression.decompress(
                        compression.zstd_decompress(payload)
                    )
        finally:
            self._sock.settimeout(None)

    def close(self):
        self._sock.close()
