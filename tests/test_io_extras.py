"""rtl_tcp client, scheduler, bandplan tests."""

import datetime
import socket
import struct
import threading
import time

import numpy as np

from sdrtpu.apps.bandplan import BandPlan
from sdrtpu.apps.scheduler import Scheduler, Task
from sdrtpu.io.rtl_tcp import RtlTcpClient


class FakeRtlTcpServer:
    """Minimal rtl_tcp server for loopback testing."""

    def __init__(self):
        self.sock = socket.socket()
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.commands = []
        self.port = self.sock.getsockname()[1]
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    def _serve(self):
        conn, _ = self.sock.accept()
        conn.sendall(b"RTL0" + struct.pack(">II", 5, 29))  # R820T, 29 gains
        # stream some u8 IQ: a byte ramp
        data = bytes(range(256)) * 32
        conn.sendall(data)
        # read any commands sent
        conn.settimeout(1.0)
        try:
            while True:
                cmd = conn.recv(5)
                if len(cmd) < 5:
                    break
                self.commands.append(struct.unpack(">BI", cmd))
        except (socket.timeout, OSError):
            pass
        conn.close()


class TestRtlTcp:
    def test_loopback(self):
        srv = FakeRtlTcpServer()
        cli = RtlTcpClient("127.0.0.1", srv.port)
        assert cli.tuner_type == 5 and cli.tuner_gain_count == 29
        cli.set_frequency(100e6)
        cli.set_sample_rate(2.4e6)
        got = []
        deadline = time.time() + 3
        while sum(len(g) for g in got) < 4096 and time.time() < deadline:
            chunk = cli.read(0.5)
            if chunk is not None:
                got.append(chunk)
        iq = np.concatenate(got)
        assert len(iq) >= 4096
        # u8 ramp: first sample (0,1) -> (-1 + j*(-0.992...))
        assert abs(iq[0].real - (0 - 128) / 128) < 1e-6
        time.sleep(1.2)
        assert (0x01, 100000000) in srv.commands
        assert (0x02, 2400000) in srv.commands
        cli.close()


class TestScheduler:
    def test_one_shot_and_recurring(self):
        s = Scheduler()
        fired = []
        base = datetime.datetime(2026, 8, 17, 10, 0, 0)
        s.add(Task(base, lambda: fired.append("a")))
        s.add(Task(base, lambda: fired.append("b"), recurring_days=1))
        assert s.tick(base - datetime.timedelta(seconds=1)) == 0
        assert s.tick(base) == 2
        assert fired == ["a", "b"]
        # one-shot removed; recurring rescheduled to tomorrow
        assert len(s.tasks) == 1
        assert s.tick(base + datetime.timedelta(days=1)) == 1


class TestBandPlan:
    def test_builtin_lookup(self):
        bp = BandPlan()
        hits = bp.lookup(98.5e6)
        assert any(b.name == "FM Broadcast" for b in hits)
        assert not bp.lookup(95e9)

    def test_json_roundtrip(self, tmp_path):
        bp = BandPlan()
        path = str(tmp_path / "plan.json")
        bp.save(path)
        bp2 = BandPlan.load(path)
        assert len(bp2.bands) == len(bp.bands)
        assert bp2.lookup(14.1e6)[0].name == "20m Amateur"


class TestBundledData:
    def test_all_bandplans_load(self):
        import glob

        from sdrtpu.apps.bandplan import BandPlan

        plans = glob.glob("res/bandplans/*.json")
        assert len(plans) >= 21  # the reference ships 21 country plans
        for p in plans:
            bp = BandPlan.load(p)
            assert bp.bands, p
            for b in bp.bands:
                assert b.end > b.start >= 0, (p, b.name)

    def test_all_colormaps_build_palettes(self):
        import glob

        from sdrtpu.apps.waterfall import build_palette, load_colormap

        maps = glob.glob("res/colormaps/*.json")
        assert len(maps) >= 10
        for m in maps:
            lut = build_palette(load_colormap(m))
            assert lut.shape[0] >= 256 and np.isfinite(lut).all(), m


class TestWavWriter:
    def test_incremental_equals_whole(self, tmp_path):
        """Streaming appends must produce byte-identical WAVs to the
        one-shot writer (the recorder streams to disk instead of
        buffering hours of capture in RAM)."""
        import numpy as np

        from sdrtpu.io import wav

        rng = np.random.default_rng(3)
        x = rng.uniform(-1, 1, (1000, 2)).astype(np.float32)
        for st in ("int16", "float32", "uint8", "int32"):
            whole = tmp_path / f"whole_{st}.wav"
            inc = tmp_path / f"inc_{st}.wav"
            wav.write_wav(str(whole), 48000, x, st)
            with wav.WavWriter(str(inc), 48000, 2, st) as w:
                for i in range(0, 1000, 256):
                    w.append(x[i:i + 256])
            assert whole.read_bytes() == inc.read_bytes(), st

    def test_append_iq_roundtrip(self, tmp_path):
        import numpy as np

        from sdrtpu.io import wav

        rng = np.random.default_rng(4)
        iq = (rng.uniform(-0.9, 0.9, 500)
              + 1j * rng.uniform(-0.9, 0.9, 500)).astype(np.complex64)
        p = tmp_path / "iq.wav"
        with wav.WavWriter(str(p), 250000, 2, "float32") as w:
            w.append_iq(iq[:200])
            w.append_iq(iq[200:])
        info, back = wav.read_iq_wav(str(p))
        assert info.samplerate == 250000
        np.testing.assert_allclose(back, iq, atol=1e-6)

    def test_scheduler_exception_does_not_kill_others(self):
        import datetime

        from sdrtpu.apps.scheduler import Scheduler, Task

        sched = Scheduler()
        ran = []
        t0 = datetime.datetime(2026, 1, 1)

        def boom():
            raise RuntimeError("task failed")

        sched.add(Task(at=t0, action=boom, name="bad"))
        sched.add(Task(at=t0, action=lambda: ran.append(1), name="good"))
        # a raising action must not stop the other due task or propagate
        assert sched.tick(now=t0) == 2
        assert ran == [1]

    def test_scheduler_action_may_reschedule(self):
        import datetime

        from sdrtpu.apps.scheduler import Scheduler, Task

        sched = Scheduler()
        t0 = datetime.datetime(2026, 1, 1)
        later = t0 + datetime.timedelta(hours=1)
        sched.add(Task(
            at=t0, name="self-rescheduling",
            action=lambda: sched.add(Task(at=later, action=lambda: None)),
        ))
        assert sched.tick(now=t0) == 1  # must not deadlock on the lock
        assert len(sched.tasks) == 1 and sched.tasks[0].at == later
