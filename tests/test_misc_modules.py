"""Scanner / recorder / frequency manager / rigctl server tests."""

import socket
import time

import json
import numpy as np

from sdrtpu.apps.frequency_manager import Bookmark, FrequencyManager
from sdrtpu.apps.recorder import Recorder, expand_template
from sdrtpu.apps.rigctl_server import RigctlServer
from sdrtpu.apps.scanner import Scanner
from sdrtpu.io import wav


class TestScanner:
    def _spectrum(self, n, wf_bw, signal_freqs, wf_center=0.0, level=-30.0):
        line = np.full(n, -80.0, np.float32)
        for f in signal_freqs:
            idx = int((f - (wf_center - wf_bw / 2)) / wf_bw * n)
            if 0 <= idx < n:
                line[max(0, idx - 2) : idx + 3] = level
        return line

    def test_finds_and_dwells(self):
        tunes = []
        sc = Scanner(
            -400e3, 400e3, interval=50e3, vfo_bandwidth=20e3,
            level_db=-50.0, linger_time=0.3, tuning_time=0.0,
            tune_callback=tunes.append,
        )
        wf_bw = 1e6
        # signal lives at +200 kHz
        line = self._spectrum(4096, wf_bw, [200e3])
        for _ in range(30):
            sc.push_spectrum(line, 0.0, wf_bw, dt=0.1)
            if sc.receiving:
                break
        assert sc.receiving
        assert abs(sc.current - 200e3) < 25e3
        # signal disappears -> scanner resumes after linger
        quiet = self._spectrum(4096, wf_bw, [])
        for _ in range(10):
            sc.push_spectrum(quiet, 0.0, wf_bw, dt=0.2)
        assert not sc.receiving


class TestRecorder:
    def test_template(self):
        import datetime

        now = datetime.datetime(2026, 8, 17, 12, 34, 56)
        out = expand_template("rec_$FREQ_$YEAR-$MONTH-$DAY.wav", 98.5e6, now)
        assert out == "rec_98500000Hz_2026-08-17.wav"

    def test_audio_recording(self, tmp_path):
        path = str(tmp_path / "a.wav")
        rec = Recorder(path, 48000, mode="audio")
        t = np.arange(4800) / 48000
        block = np.stack([np.sin(2 * np.pi * 440 * t)] * 2).astype(np.float32)
        rec.push(block)
        rec.push(block)
        rec.close()
        info, audio = wav.read_wav(path)
        assert info.frames == 9600 and info.channels == 2
        assert rec.peak > 0.9

    def test_silence_skip(self, tmp_path):
        path = str(tmp_path / "b.wav")
        rec = Recorder(path, 48000, ignore_silence=True, silence_threshold=0.01)
        rec.push(np.zeros((2, 4800), np.float32))
        rec.push(np.full((2, 4800), 0.5, np.float32))
        rec.close()
        info, _ = wav.read_wav(path)
        assert info.frames == 4800  # silence dropped


class TestFrequencyManager:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "fm.json")
        fm = FrequencyManager(path)
        fm.add("Ham", "repeater", Bookmark(145.6e6, 12500.0, "nfm"))
        fm.add("BC", "radio1", Bookmark(98.5e6, 200e3, "wfm"))
        fm.save()
        fm2 = FrequencyManager(path)
        bm = fm2.get("Ham", "repeater")
        assert bm and bm.frequency == 145.6e6 and bm.mode == "nfm"
        tuned = []
        fm2.apply("BC", "radio1", lambda f, m, b: tuned.append((f, m, b)))
        assert tuned == [(98.5e6, "wfm", 200e3)]


class TestRigctl:
    def test_freq_commands(self):
        state = {"freq": 100e6, "rec": False}
        srv = RigctlServer(
            "127.0.0.1", 0,
            get_freq=lambda: state["freq"],
            set_freq=lambda f: state.update(freq=f),
            start_recorder=lambda: state.update(rec=True),
            stop_recorder=lambda: state.update(rec=False),
        )
        s = socket.create_connection(("127.0.0.1", srv.port))
        s.sendall(b"F 145600000\n")
        assert s.recv(64) == b"RPRT 0\n"
        assert state["freq"] == 145600000.0
        s.sendall(b"f\n")
        assert s.recv(64) == b"145600000\n"
        s.sendall(b"AOS\n")
        s.recv(64)
        assert state["rec"]
        s.sendall(b"LOS\n")
        s.recv(64)
        assert not state["rec"]
        s.sendall(b"q\n")
        time.sleep(0.1)
        s.close()
        srv.close()

    def test_mode_and_vfo_commands(self):
        """The reference's full NET rigctl set (main.cpp:427-567): M/m
        with bandwidth, the '?' queries, V/v, chk_vfo, s/S."""
        state = {"mode": "wfm", "bw": 150000.0}
        srv = RigctlServer(
            "127.0.0.1", 0,
            get_mode=lambda: state["mode"],
            set_mode=lambda m: state.update(mode=m),
            get_bandwidth=lambda: state["bw"],
            set_bandwidth=lambda b: state.update(bw=b),
        )
        h = srv.handle_command
        assert h("m") == "WFM\n150000\n"
        assert h("M ?") == "FM WFM AM DSB USB CW LSB RAW\n"
        assert h("M FM 12500") == "RPRT 0\n"
        assert state["mode"] == "nfm" and state["bw"] == 12500.0
        assert h("m") == "FM\n12500\n"
        assert h("M USB -1") == "RPRT 0\n"
        assert state["mode"] == "usb" and state["bw"] == 12500.0  # -1: keep
        assert h("M USB") == "RPRT 1\n"          # missing bandwidth
        assert h("M XXX 1000") == "RPRT 1\n"     # unknown mode
        assert h("M USB 1e3") == "RPRT 1\n"      # non-integer bandwidth
        assert h("v") == "VFO\n"
        assert h("V VFO") == "RPRT 0\n"
        assert h("V ?") == "VFO\n"
        assert h("V VFOB") == "RPRT 1\n"
        assert h("\\chk_vfo") == "CHKVFO 0\n"
        assert h("s") == "0\nVFOA\n"
        assert h("S 0 VFOA") == "RPRT 0\n"
        assert h("\\recorder_start") == "RPRT 0\n"
        srv.close()


class TestDiagrams:
    def test_constellation(self):
        from sdrtpu.apps.diagrams import ConstellationDiagram

        cd = ConstellationDiagram(256)
        pts = np.exp(1j * (np.random.default_rng(0).integers(0, 4, 500) * np.pi / 2 + np.pi / 4))
        cd.push(pts.astype(np.complex64))
        assert len(cd.points) == 256
        assert cd.evm() < 1e-3
        img = cd.density(64)
        assert img.shape == (64, 64) and img.max() == 255

    def test_symbol_diagram(self):
        from sdrtpu.apps.diagrams import SymbolDiagram

        sd = SymbolDiagram(128)
        sd.push(np.array([1.0, -1.0] * 100))
        hist, edges = sd.histogram(bins=8)
        assert hist.sum() == 128


class TestBenchmarkUtility:
    def test_measure_op_cpu(self):
        import jax.numpy as jnp
        from sdrtpu.benchmark import measure_op
        from sdrtpu.kernels.fir import Fir
        from sdrtpu.kernels import taps

        op = Fir(taps.low_pass(0.2, 0.1, 1.0), dtype=jnp.complex64)
        r = measure_op(op, (8192,), k_blocks=2, n_dispatch=2, reps=1)
        assert r["msps"] > 0 and r["backend"] == "cpu"


class TestPresence:
    def test_status_format_and_throttle(self):
        from sdrtpu.apps.presence import PresencePublisher, format_frequency

        assert format_frequency(98_500_000) == "98.5MHz"
        assert format_frequency(7_074_000) == "7.074MHz"
        assert format_frequency(144_500) == "144.5kHz"
        got = []
        p = PresencePublisher(sinks=[got.append])
        assert p.update(98.5e6, "WFM", now=0.0)
        assert got[-1]["details"] == "98.5MHz - WFM"
        assert not p.update(98.5e6, "WFM", now=0.5)   # unchanged
        assert not p.update(98.7e6, "WFM", now=0.5)   # throttled
        assert p.update(98.7e6, "WFM", now=2.0)
        assert len(got) == 2

    def test_file_sink(self, tmp_path):
        import json
        from sdrtpu.apps.presence import PresencePublisher, file_sink

        path = tmp_path / "presence.json"
        p = PresencePublisher(sinks=[file_sink(str(path))])
        p.update(14.074e6, "USB", now=0.0)
        st = json.loads(path.read_text())
        assert st["details"] == "14.074MHz - USB" and st["mode"] == "USB"


class TestMetrics:
    def test_registry_snapshot(self):
        from sdrtpu.metrics import MetricsRegistry

        t = [0.0]
        m = MetricsRegistry()
        thr = m.throughput("in", samplerate=1e6, clock=lambda: t[0])
        thr.add(500_000); t[0] = 0.25; thr.add(500_000)
        # the first add's samples arrived over an unknown interval before
        # t0 and are excluded: 500k over 0.25 s = 2 Msps (not 4)
        assert thr.rate == 2e6 and thr.realtime_factor == 2.0
        m.counter("frames").add(3)
        m.gauge("snr_db").set(23.5)
        m.gauge("unset.snr_db")  # never set: must serialize as null
        snap = m.snapshot()
        assert snap["counters"]["frames"] == 3
        assert snap["gauges"]["snr_db"] == 23.5
        assert snap["gauges"]["unset.snr_db"] is None
        assert snap["throughput"]["in"]["realtime_factor"] == 2.0
        import json
        json.loads(m.to_json())  # strict JSON (no NaN tokens)
        # windowed rate recovers after a pause (lifetime average would
        # stay blended forever)
        t[0] = 10.0; thr.add(250_000)   # completes the stale first window
        t[0] = 13.0; thr.add(750_000)   # fresh window: 750k over 3 s
        assert thr.window_rate is not None
        assert abs(thr.window_rate - 750_000 / 3.0) < 1.0

    def test_receiver_integration(self):
        import numpy as np
        from sdrtpu.apps.receiver import IQFrontend, Receiver, VfoConfig
        from sdrtpu.metrics import MetricsRegistry

        fs = 240_000.0
        fe = IQFrontend(fs, vfos={"v0": VfoConfig(offset_hz=0.0, mode="nfm")},
                        fft_size=256)
        m = MetricsRegistry()
        got = []
        rx = Receiver(fe, audio_sinks={"v0": got.append}, metrics=m)
        n = rx.block_len * 2
        t = np.arange(n) / fs
        iq = np.exp(1j * 2 * np.pi * 1000.0 * t).astype(np.complex64)
        rx.push(iq)
        snap = m.snapshot()
        assert snap["throughput"]["receiver.input"]["total_samples"] == n
        assert any(k.startswith("audio.v0") for k in snap["gauges"]) or got


class TestDiscordIpc:
    """Presence over the real Discord IPC wire protocol (fake daemon)."""

    def _fake_daemon(self, path, received):
        import socket as sk
        import struct
        import threading

        srv = sk.socket(sk.AF_UNIX, sk.SOCK_STREAM)
        srv.bind(path)
        srv.listen(1)

        def serve():
            conn, _ = srv.accept()
            try:
                while True:
                    hdr = b""
                    while len(hdr) < 8:
                        c = conn.recv(8 - len(hdr))
                        if not c:
                            return
                        hdr += c
                    op, length = struct.unpack("<II", hdr)
                    body = b""
                    while len(body) < length:
                        body += conn.recv(length - len(body))
                    received.append((op, json.loads(body)))
                    if op == 0:  # handshake -> READY
                        ready = json.dumps(
                            {"cmd": "DISPATCH", "evt": "READY"}
                        ).encode()
                        conn.sendall(struct.pack("<II", 1, len(ready)) + ready)
                    if op == 2:
                        return
            finally:
                conn.close()
                srv.close()

        t = threading.Thread(target=serve, daemon=True)
        t.start()
        return t

    def test_handshake_and_activity(self, tmp_path):
        from sdrtpu.apps.presence import DiscordIpc, PresencePublisher

        path = str(tmp_path / "discord-ipc-0")
        received = []
        t = self._fake_daemon(path, received)
        ipc = DiscordIpc("12345", socket_path=path)
        pub = PresencePublisher(sinks=[ipc])
        assert pub.update(93.5e6, "wfm", now=0.0)
        ipc.close()
        t.join(timeout=5)
        ops = [op for op, _ in received]
        assert ops[0] == 0 and received[0][1] == {"v": 1, "client_id": "12345"}
        frames = [p for op, p in received if op == 1]
        assert frames and frames[0]["cmd"] == "SET_ACTIVITY"
        assert frames[0]["args"]["activity"]["details"] == "93.5MHz - wfm"
        assert ops[-1] == 2  # clean CLOSE


class TestModuleCom:
    """ModuleComManager named-interface RPC (module_com.h parity)."""

    def test_registry_semantics(self):
        from sdrtpu.apps.module_com import ModuleComManager

        mc = ModuleComManager()
        calls = []
        assert mc.register_interface("radio", "Radio",
                                     lambda c, a: calls.append((c, a)) or 42)
        assert not mc.register_interface("other", "Radio", lambda c, a: 0)
        assert mc.interface_exists("Radio")
        assert mc.get_module_name("Radio") == "radio"
        assert mc.call_interface("Radio", 1, "x") == 42
        assert calls == [(1, "x")]
        assert mc.unregister_interface("Radio")
        assert not mc.interface_exists("Radio")
        try:
            mc.call_interface("Radio", 0)
            assert False
        except KeyError:
            pass

    def test_radio_interface_over_receiver(self):
        import jax

        from sdrtpu.apps.module_com import (
            RADIO_IFACE_CMD_GET_BANDWIDTH,
            RADIO_IFACE_CMD_GET_MODE,
            RADIO_IFACE_CMD_SET_MODE,
            RADIO_IFACE_CMD_SET_SQUELCH_LEVEL,
            RADIO_IFACE_CMD_GET_SQUELCH_LEVEL,
            RADIO_IFACE_CMD_SET_SQUELCH_MODE,
            RADIO_IFACE_CMD_GET_SQUELCH_MODE,
            RADIO_IFACE_MODES,
            ModuleComManager,
            RadioInterface,
        )
        from sdrtpu.apps.receiver import IQFrontend, Receiver, VfoConfig

        fs = 400000.0
        fe = IQFrontend(fs, {"v0": VfoConfig(50000.0, "nfm")}, spectrum=False)
        rx = Receiver(fe, block_len=fe.block_multiple())
        rebuilds = []
        mc = ModuleComManager()
        mc.register_interface(
            "radio", "Radio",
            RadioInterface(rx, "v0", lambda: rebuilds.append(1)))
        assert RADIO_IFACE_MODES[mc.call_interface(
            "Radio", RADIO_IFACE_CMD_GET_MODE)] == "nfm"
        mc.call_interface("Radio", RADIO_IFACE_CMD_SET_MODE,
                          RADIO_IFACE_MODES.index("am"))
        assert fe.vfos["v0"].cfg.mode == "am" and len(rebuilds) == 1
        assert mc.call_interface("Radio", RADIO_IFACE_CMD_GET_BANDWIDTH) is None
        mc.call_interface("Radio", RADIO_IFACE_CMD_SET_SQUELCH_MODE, True)
        assert mc.call_interface("Radio", RADIO_IFACE_CMD_GET_SQUELCH_MODE)
        mc.call_interface("Radio", RADIO_IFACE_CMD_SET_SQUELCH_LEVEL, -37.0)
        assert mc.call_interface(
            "Radio", RADIO_IFACE_CMD_GET_SQUELCH_LEVEL) == -37.0
        # the level survives disable/enable, and a level set WHILE
        # disabled is used at the next enable (the reference stores the
        # level independently of the enable flag)
        mc.call_interface("Radio", RADIO_IFACE_CMD_SET_SQUELCH_MODE, False)
        mc.call_interface("Radio", RADIO_IFACE_CMD_SET_SQUELCH_LEVEL, -80.0)
        assert mc.call_interface(
            "Radio", RADIO_IFACE_CMD_GET_SQUELCH_LEVEL) == -80.0
        mc.call_interface("Radio", RADIO_IFACE_CMD_SET_SQUELCH_MODE, True)
        assert fe.vfos["v0"].cfg.squelch_db == -80.0
