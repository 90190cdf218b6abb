"""Web spectrum view: endpoints over a live receiver."""

import json
import urllib.request

import numpy as np

from sdrtpu.apps.receiver import IQFrontend, Receiver, VfoConfig
from sdrtpu.apps.waterfall import WaterfallView
from sdrtpu.apps.webview import SpectrumWebServer


def get(port, path):
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                    timeout=10) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


class TestWebView:
    def test_endpoints_and_live_tune(self):
        fs = 400000.0
        view = WaterfallView(fft_size=1024, height=64, view_width=256)
        fe = IQFrontend(fs, {"v0": VfoConfig(100000.0, "nfm")},
                        spectrum=True, fft_size=1024, fft_rate=fs / 4096)
        rx = Receiver(fe, block_len=fe.block_multiple(),
                      spectrum_sink=view.push)
        srv = SpectrumWebServer(view, receiver=rx)
        try:
            t = np.arange(4 * rx.block_len) / fs
            iq = (0.5 * np.exp(2j * np.pi * 100000.0 * t)).astype(np.complex64)
            rx.push(iq)

            code, body = get(srv.port, "/")
            assert code == 200 and b"canvas" in body

            code, body = get(srv.port, "/spectrum.json")
            spec = json.loads(body)
            assert code == 200 and len(spec["db"]) == 256
            # the 100 kHz tone must light the spectrum
            peak_bin = int(np.argmax(spec["db"]))
            freqs = np.fft.fftshift(np.fft.fftfreq(1024, 1 / fs))
            peak = freqs[peak_bin * 4 + 2]  # 256-wide view of 1024 bins
            assert abs(peak - 100000.0) < 5000.0, peak

            code, body = get(srv.port, "/waterfall.png")
            assert code == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"

            code, body = get(srv.port, "/status.json")
            st = json.loads(body)
            assert st["vfos"]["v0"]["offset"] == 100000.0

            code, body = get(srv.port, "/tune?vfo=v0&offset=-50000")
            assert code == 200 and json.loads(body)["ok"]
            code, body = get(srv.port, "/status.json")
            assert json.loads(body)["vfos"]["v0"]["offset"] == -50000.0

            code, _ = get(srv.port, "/nope")
            assert code == 404
        finally:
            srv.close()
