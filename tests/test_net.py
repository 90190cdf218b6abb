"""Network IQ ingest/egress and SDR++ server protocol loopback tests."""

import time

import numpy as np

from sdrtpu.io import compression
from sdrtpu.io.net import IqExporter, NetworkSource, bytes_to_iq, iq_to_bytes
from sdrtpu.io.server_protocol import SdrppClient, SdrppServer

RNG = np.random.default_rng(77)


def rand_iq(n):
    return (
        (RNG.uniform(-0.9, 0.9, n) + 1j * RNG.uniform(-0.9, 0.9, n))
    ).astype(np.complex64)


class TestFormats:
    def test_roundtrip_all(self):
        iq = rand_iq(256)
        for fmt, tol in [("u8", 1e-2), ("i8", 1e-2), ("i16", 1e-4), ("f32", 0)]:
            back = bytes_to_iq(iq_to_bytes(iq, fmt), fmt)
            np.testing.assert_allclose(back, iq, atol=tol or 1e-7)


class TestCompression:
    def test_pcm_roundtrip(self):
        rng = np.random.default_rng(123)
        iq = (
            rng.uniform(-0.9, 0.9, 512) + 1j * rng.uniform(-0.9, 0.9, 512)
        ).astype(np.complex64) * 3.0
        iq[0] = 2.8 + 2.8j  # pin the positive max near the negative extreme
        for t, tol in [
            (compression.PCM_TYPE_I8, 0.1),
            (compression.PCM_TYPE_I16, 1e-3),
            (compression.PCM_TYPE_F32, 1e-7),
        ]:
            back = compression.decompress(compression.compress(iq, t))
            np.testing.assert_allclose(back, iq, atol=tol)

    def test_asymmetric_baseband_roundtrips(self):
        """DC-offset / all-negative components must survive: the scaler is
        max |component| (the wire format is self-describing, so this stays
        compatible with the reference's decompressor while avoiding its
        signed-max clipping quirk, sample_stream_compressor.h:48-51)."""
        rng = np.random.default_rng(7)
        # I strongly negative, Q small: the signed max would pick ~0.05
        # and clip all of I to -128
        iq = (
            rng.uniform(-0.7, -0.3, 256) + 1j * rng.uniform(-0.05, 0.05, 256)
        ).astype(np.complex64)
        for t, tol in [
            (compression.PCM_TYPE_I8, 0.01),
            (compression.PCM_TYPE_I16, 1e-4),
        ]:
            back = compression.decompress(compression.compress(iq, t))
            np.testing.assert_allclose(back, iq, atol=tol)


class TestNetLoopback:
    def test_tcp_exporter_to_source(self):
        src = NetworkSource("tcp", "127.0.0.1", 0, fmt="i16")
        exp = IqExporter("tcp-client", "127.0.0.1", src.port, fmt="i16")
        iq = rand_iq(4096)
        time.sleep(0.1)
        exp.send(iq)
        got = []
        deadline = time.time() + 3.0
        while sum(len(g) for g in got) < len(iq) and time.time() < deadline:
            chunk = src.read(timeout=0.5)
            if chunk is not None:
                got.append(chunk)
        back = np.concatenate(got)
        assert len(back) == len(iq)
        np.testing.assert_allclose(back, iq, atol=1e-4)
        exp.close()
        src.close()

    def test_udp_loopback(self):
        src = NetworkSource("udp", "127.0.0.1", 0, fmt="f32")
        exp = IqExporter("udp", "127.0.0.1", src.port, fmt="f32")
        iq = rand_iq(1000)
        exp.send(iq)
        got = []
        deadline = time.time() + 3.0
        while sum(len(g) for g in got) < len(iq) and time.time() < deadline:
            chunk = src.read(timeout=0.5)
            if chunk is not None:
                got.append(chunk)
        back = np.concatenate(got)
        np.testing.assert_allclose(back, iq, atol=1e-6)
        exp.close()
        src.close()


class TestServerProtocol:
    def test_full_session(self):
        tuned = []
        server = SdrppServer(
            "127.0.0.1", 0, samplerate=2_400_000.0,
            tune_callback=tuned.append,
        )
        client = SdrppClient("127.0.0.1", server.port)
        assert client.get_samplerate() == 2_400_000.0
        client.set_frequency(98.5e6)
        client.set_sample_type(compression.PCM_TYPE_I16)
        client.start()
        deadline = time.time() + 3.0
        while not server.running and time.time() < deadline:
            time.sleep(0.05)
        assert server.running
        assert tuned and tuned[0] == 98.5e6

        rng = np.random.default_rng(9)
        iq = (rng.uniform(-0.9, 0.9, 2048) + 1j * rng.uniform(-0.9, 0.9, 2048)).astype(np.complex64)
        iq[0] = 0.95 + 0.95j  # pin signed max (wire format scales by it)
        server.send_baseband(iq)
        back = client.recv_baseband()
        assert back is not None
        np.testing.assert_allclose(back, iq, atol=2e-3)

        client.stop()
        deadline = time.time() + 3.0
        while server.running and time.time() < deadline:
            time.sleep(0.05)
        assert not server.running
        client.close()
        server.close()


class TestZstd:
    def test_zstd_roundtrip(self):
        # libzstd via ctypes when the zstandard wheel is absent
        assert compression.HAVE_ZSTD
        data = (b"\x01\x02\x03\x04" * 4096) + b"tail"
        z = compression.zstd_compress(data, level=1)
        assert len(z) < len(data)
        assert compression.zstd_decompress(z) == data

    def test_ctypes_fallback_directly(self):
        # exercise the ctypes binding even when the wheel is installed
        import pytest

        ctz = compression._CtypesZstd()
        data = b"sdrtpu " * 999 + b"\x00\xff"
        z = ctz.compress(data, level=1)
        assert ctz.decompress(z) == data
        # forged frame header declaring a huge content size must be
        # rejected before allocation (network DoS guard)
        import struct
        forged = struct.pack("<IBQ", 0xFD2FB528, 0xE0, 1 << 42) + b"x" * 9
        with pytest.raises(RuntimeError):
            ctz.decompress(forged)

    def test_zstd_wrapped_iq_payload(self):
        import numpy as np

        rng = np.random.default_rng(3)
        iq = (rng.standard_normal(2048) + 1j * rng.standard_normal(2048)).astype(
            np.complex64
        )
        payload = compression.compress(iq, compression.PCM_TYPE_I16)
        z = compression.zstd_compress(payload)
        back = compression.decompress(compression.zstd_decompress(z))
        assert np.max(np.abs(back - iq)) < 1e-3


class TestNetworkSourceNativePath:
    def test_tcp_native_and_python_paths_agree(self):
        from sdrtpu.native import get_lib

        iq = rand_iq(8192)
        for native in ((True, False) if get_lib() is not None else (False,)):
            src = NetworkSource("tcp", "127.0.0.1", 0, fmt="i16",
                                native=native)
            exp = IqExporter("tcp-client", "127.0.0.1", src.port, fmt="i16")
            time.sleep(0.1)
            exp.send(iq)
            got = []
            deadline = time.time() + 3.0
            while sum(len(g) for g in got) < len(iq) and time.time() < deadline:
                chunk = src.read(timeout=0.5)
                if chunk is not None:
                    got.append(chunk)
            back = np.concatenate(got)
            assert len(back) == len(iq), f"native={native}"
            np.testing.assert_allclose(back, iq, atol=1e-4)
            if native:
                assert src._pump is not None  # the pump path was active
            exp.close()
            src.close()
