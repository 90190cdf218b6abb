"""SpyServer client against an in-process fake server."""

import socket
import struct
import threading
import time

import numpy as np

from sdrtpu.io.spyserver import (
    CMD_HELLO,
    CMD_SET_SETTING,
    MSG_CLIENT_SYNC,
    MSG_DEVICE_INFO,
    MSG_INT16_IQ,
    PROTOCOL_VERSION,
    SpyServerClient,
)


class FakeSpyServer:
    def __init__(self):
        self.sock = socket.socket()
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.settings = []
        self.hello = None
        threading.Thread(target=self._serve, daemon=True).start()

    def _msg(self, conn, mtype, body):
        conn.sendall(struct.pack("<IIIII", PROTOCOL_VERSION, mtype, 0, 0, len(body)) + body)

    def _serve(self):
        conn, _ = self.sock.accept()
        # read HELLO
        hdr = conn.recv(8)
        ctype, size = struct.unpack("<II", hdr)
        body = conn.recv(size)
        assert ctype == CMD_HELLO
        self.hello = body
        # device info + sync
        self._msg(conn, MSG_DEVICE_INFO, struct.pack("<12I", 2, 1234, 2500000, 2000000, 4, 1, 21, 0, 1800000000, 12, 0, 0))
        self._msg(conn, MSG_CLIENT_SYNC, struct.pack("<9I", 1, 10, 100000000, 100000000, 0, 0, 2**31, 0, 0))
        # IQ payload
        iq = (np.arange(512, dtype=np.int16) - 256)
        self._msg(conn, MSG_INT16_IQ, iq.tobytes())
        # read settings commands
        conn.settimeout(2.0)
        try:
            while True:
                hdr = conn.recv(8)
                if len(hdr) < 8:
                    break
                ctype, size = struct.unpack("<II", hdr)
                body = conn.recv(size)
                if ctype == CMD_SET_SETTING:
                    self.settings.append(struct.unpack("<II", body))
        except (socket.timeout, OSError):
            pass


def test_client_session():
    srv = FakeSpyServer()
    cli = SpyServerClient("127.0.0.1", srv.port)
    info = cli.wait_device_info()
    assert info and info.serial == 1234 and info.max_sample_rate == 2500000
    cli.set_frequency(98.5e6)
    cli.start_stream()
    iq = cli.read(timeout=2.0)
    assert iq is not None and len(iq) == 256
    assert abs(iq[0].real - (-256 / 32768.0)) < 1e-6
    time.sleep(2.2)
    assert (101, 98500000) in srv.settings  # IQ frequency
    assert (1, 1) in srv.settings  # streaming enabled
    cli.close()


def test_digital_gain_scaling_matches_reference():
    """The reference DIVIDES integer formats by the reported digital
    gain (spyserver_client.cpp:136-151) but MULTIPLIES the float format
    by it (spyserver_client.cpp:156-160) — pin both (advisor r2)."""
    import threading as _t
    from sdrtpu.io.spyserver import MSG_FLOAT_IQ, MSG_UINT8_IQ

    cli = SpyServerClient.__new__(SpyServerClient)
    cli._cv = _t.Condition()
    cli._chunks = []
    cli._info_event = _t.Event()

    mflags = 20  # gain = 10^(20/20) = 10x
    cli._handle(MSG_INT16_IQ, np.int16([16384, 0]).tobytes(), mflags)
    cli._handle(MSG_UINT8_IQ, np.uint8([192, 128]).tobytes(), mflags)
    cli._handle(MSG_FLOAT_IQ, np.float32([0.25, 0.0]).tobytes(), mflags)
    i16, u8, f32 = cli._chunks
    assert abs(i16[0].real - 0.5 / 10.0) < 1e-6
    assert abs(u8[0].real - 0.5 / 10.0) < 1e-6
    assert abs(f32[0].real - 0.25 * 10.0) < 1e-6
