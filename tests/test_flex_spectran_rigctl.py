"""Tests: FLEX frame layer, SpectranHTTP source, rigctl client."""

import socket
import threading
import time

import numpy as np
import pytest

from sdrtpu.apps.rigctl_client import RigctlClient, RigctlProtocolClient
from sdrtpu.apps.rigctl_server import RigctlServer
from sdrtpu.decoders.flex import (
    FlexDecoder,
    build_flex_frame,
    deinterleave_block,
    interleave_block,
    make_fiw,
    parse_fiw,
)
from sdrtpu.io.spectran_http import SpectranHttpClient

RNG = np.random.default_rng(3)


class TestFlex:
    def test_fiw_roundtrip(self):
        for cycle, frame in [(0, 0), (7, 42), (14, 127)]:
            fiw = parse_fiw(make_fiw(cycle, frame))
            assert fiw == {"cycle": cycle, "frame": frame}
        assert parse_fiw(make_fiw(3, 9) ^ 0x10) is None  # checksum catches

    def test_interleave_roundtrip(self):
        words = RNG.integers(0, 1 << 32, 8, dtype=np.uint64)
        np.testing.assert_array_equal(
            deinterleave_block(interleave_block(words)), words
        )

    def test_frame_loopback(self):
        msgs = [(0x12345, "HELLO FLEX"), (0x0BEEF, "SDR ON TPU!")]
        bits = build_flex_frame(cycle=2, frame=77, messages=msgs)
        noise = RNG.integers(0, 2, 300).astype(np.uint8)
        dec = FlexDecoder()
        out = []
        stream = np.concatenate([noise, bits, noise[:100]])
        for chunk in np.array_split(stream, 7):
            out.extend(dec.process(chunk))
        assert [(m.address, m.text) for m in out] == msgs
        assert all(m.cycle == 2 and m.frame == 77 for m in out)

    def test_bit_errors_corrected(self):
        bits = build_flex_frame(1, 5, [(0x54321, "BCH OK")]).copy()
        # one bit error in every interleaved block survives BCH correction
        for blk in range(11):
            bits[96 + blk * 256 + int(RNG.integers(0, 256))] ^= 1
        out = FlexDecoder().process(bits)
        assert [(m.address, m.text) for m in out] == [(0x54321, "BCH OK")]


CHUNK_META = (
    b'{"startFrequency":99000000,"endFrequency":101000000,'
    b'"sampleFrequency":2000000}\n'
)


def _spectran_fake_server(sock: socket.socket, puts: list[bytes]):
    conn, _ = sock.accept()
    req = b""
    while b"\r\n\r\n" not in req:
        req += conn.recv(4096)
    if req.startswith(b"PUT"):
        while len(req.split(b"\r\n\r\n", 1)[1]) < int(
            [l for l in req.split(b"\r\n") if l.lower().startswith(b"content-length")][
                0
            ].split(b":")[1]
        ):
            req += conn.recv(4096)
        puts.append(req)
        conn.sendall(b"HTTP/1.1 200 OK\r\nContent-Length: 0\r\n\r\n")
        conn.close()
        return
    conn.sendall(b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n")
    iq = np.arange(32, dtype=np.float32)  # 16 complex samples
    payload = CHUNK_META + bytes([0x1E]) + iq.tobytes()
    for _ in range(2):
        conn.sendall(hex(len(payload))[2:].encode() + b"\r\n" + payload + b"\r\n")
    conn.sendall(b"0\r\n\r\n")
    conn.close()


class TestSpectranHttp:
    def _listener(self):
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        s.listen(2)
        return s

    def test_stream_and_metadata(self):
        srv = self._listener()
        port = srv.getsockname()[1]
        threading.Thread(
            target=_spectran_fake_server, args=(srv, []), daemon=True
        ).start()
        freqs, rates = [], []
        c = SpectranHttpClient(
            "127.0.0.1", port, on_center_freq=freqs.append, on_samplerate=rates.append
        )
        blocks = [c.read(timeout=3.0) for _ in range(2)]
        assert all(b is not None and b.size == 16 for b in blocks)
        np.testing.assert_allclose(blocks[0].real, np.arange(0, 32, 2))
        assert freqs == [100_000_000] and rates == [2_000_000]
        assert c.center_freq == 100_000_000 and c.samplerate == 2_000_000
        c.close()
        srv.close()

    def test_retune_put(self):
        srv = self._listener()
        port = srv.getsockname()[1]
        puts: list[bytes] = []
        threading.Thread(
            target=_spectran_fake_server, args=(srv, puts), daemon=True
        ).start()
        c = SpectranHttpClient("127.0.0.1", port)
        time.sleep(0.1)
        threading.Thread(
            target=_spectran_fake_server, args=(srv, puts), daemon=True
        ).start()
        c.samplerate = 2_000_000
        assert c.set_center_frequency(433_000_000) == 200
        deadline = time.time() + 2.0
        while not puts and time.time() < deadline:
            time.sleep(0.01)
        assert puts and b'"centerfreq": 433000000' in puts[0]
        c.close()
        srv.close()


class TestRigctlClient:
    def test_panadapter_sync(self):
        rig_freq = []
        srv = RigctlServer(port=0, set_freq=rig_freq.append, get_freq=lambda: 7074000.0)
        hw_tunes = []
        cli = RigctlClient(
            port=srv.port, if_freq=8_830_000.0, tune_hw=hw_tunes.append
        )
        cli.start()
        assert hw_tunes == [8_830_000.0]  # SDR pinned to the rig IF
        assert cli.tune(14_200_000.0) == 0
        assert cli.tune(7_074_000.0) == 0
        deadline = time.time() + 2.0
        while len(rig_freq) < 2 and time.time() < deadline:
            time.sleep(0.01)
        assert rig_freq == [14_200_000.0, 7_074_000.0]
        assert hw_tunes == [8_830_000.0]  # retunes never touched the SDR
        cli.set_if_freq(10_700_000.0)
        assert hw_tunes[-1] == 10_700_000.0
        cli.stop()
        srv.close()

    def test_protocol_get_freq(self):
        srv = RigctlServer(port=0, get_freq=lambda: 145_500_000.0)
        c = RigctlProtocolClient("127.0.0.1", srv.port)
        assert c.get_freq() == pytest.approx(145_500_000.0)
        c.close()
        srv.close()
