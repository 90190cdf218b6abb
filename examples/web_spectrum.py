"""Web waterfall/spectrum view over a live receiver.

Serves http://127.0.0.1:8642/ with a canvas waterfall + spectrum trace
and live HTTP retuning, while demodulating a synthesized WFM station
(point ``--input`` at a real IQ WAV to replay a capture instead).

    python examples/web_spectrum.py [--port 8642] [--input capture.wav]
"""

import argparse
import sys
import time

import numpy as np
import jax

from sdrtpu.apps.receiver import IQFrontend, Receiver, VfoConfig
from sdrtpu.apps.waterfall import WaterfallView
from sdrtpu.apps.webview import SpectrumWebServer
from sdrtpu.io import wav


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8642)
    ap.add_argument("--input", help="IQ WAV to replay (loops)")
    ap.add_argument("--rate", type=float, default=1_000_000.0)
    ap.add_argument("--offset", type=float, default=250_000.0)
    ap.add_argument("--mode", default="wfm")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.input:
        info, iq = wav.read_iq_wav(args.input)
        fs = float(info.samplerate)
    else:
        fs, iq = args.rate, None

    view = WaterfallView(fft_size=4096, height=256, view_width=1024,
                         wf_min=-80.0, wf_max=0.0)
    fe = IQFrontend(fs, {"v0": VfoConfig(args.offset, args.mode)},
                    spectrum=True, fft_size=4096, fft_rate=fs / 65536)
    rx = Receiver(fe, spectrum_sink=view.push)
    srv = SpectrumWebServer(view, receiver=rx, port=args.port)
    print(f"serving http://127.0.0.1:{srv.port}/", flush=True)
    rx.warmup()

    block = rx.block_len
    if iq is not None and len(iq) < block:
        print(f"input too short: {len(iq)} samples < one {block}-sample "
              "block; record a longer capture", file=sys.stderr)
        return 1
    t0 = 0
    mod_phase = 0.0  # FM phase integral carried across blocks
    try:
        while True:
            if iq is not None:
                x = iq[t0 % len(iq): t0 % len(iq) + block]
                if len(x) < block:
                    t0 = 0
                    continue
            else:
                t = (t0 + np.arange(block)) / fs
                mpx = (0.6 * np.sin(2 * np.pi * 800.0 * t)
                       + 0.1 * np.sin(2 * np.pi * 19000.0 * t))
                ph = mod_phase + np.cumsum(2 * np.pi * 75000.0 * mpx / fs)
                mod_phase = float(ph[-1] % (2 * np.pi))
                x = (0.5 * np.exp(1j * (2 * np.pi * args.offset * t + ph))
                     ).astype(np.complex64)
            rx.push(x)
            t0 += block
            time.sleep(block / fs)  # real-time pacing
    except KeyboardInterrupt:
        pass
    srv.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
