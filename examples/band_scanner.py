"""Unattended band scanner: sweep -> stop on activity -> record.

The reference workflow (scanner + radio + recorder modules working
together over the waterfall and module RPC) as one script: a `Scanner`
watches the live spectrum, live-retunes the receiver's VFO on activity
(`Receiver.retune` — a state-table swap, no recompilation), and a
`Recorder` captures audio WAVs of every hit.

    python examples/band_scanner.py --input wideband.wav \
        --start -400000 --stop 400000 --interval 100000 --level -40

``--selftest`` synthesizes a 1 Msps band with two active NFM stations
among silent channels and asserts both are found and recorded.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

import numpy as np
import jax

from sdrtpu.apps.receiver import IQFrontend, Receiver, VfoConfig
from sdrtpu.apps.recorder import Recorder
from sdrtpu.apps.scanner import Scanner
from sdrtpu.io import wav


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="wideband IQ WAV to scan")
    ap.add_argument("--rate", type=float, default=1_000_000.0)
    ap.add_argument("--start", type=float, default=-400_000.0)
    ap.add_argument("--stop", type=float, default=400_000.0)
    ap.add_argument("--interval", type=float, default=100_000.0)
    ap.add_argument("--level", type=float, default=-40.0)
    ap.add_argument("--mode", default="nfm")
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("--selftest", action="store_true")
    args = ap.parse_args()
    jax.config.update("jax_platforms", "cpu") if args.selftest else None

    if args.selftest:
        fs = args.rate
        n = int(fs * 6.0)
        t = np.arange(n) / fs
        x = np.zeros(n, np.complex128)
        # station 1 keys off halfway through so the scanner resumes and
        # finds station 2 (a constant carrier would hold linger forever)
        for f0, tone, t_on, t_off in ((-300_000.0, 700.0, 0.0, 2.5),
                                      (200_000.0, 1100.0, 0.0, 6.0)):
            msg = np.sin(2 * np.pi * tone * t)
            ph = np.cumsum(2 * np.pi * 2500.0 * msg / fs)
            key = ((t >= t_on) & (t < t_off)).astype(float)
            x += 0.4 * key * np.exp(1j * (2 * np.pi * f0 * t + ph))
        x += 0.002 * (np.random.default_rng(0).standard_normal(n)
                      + 1j * np.random.default_rng(1).standard_normal(n))
        iq = x.astype(np.complex64)
    else:
        if not args.input:
            ap.error("--input required (or --selftest)")
        info, iq = wav.read_iq_wav(args.input)
        args.rate = float(info.samplerate)
    fs = args.rate

    out_dir = args.out_dir or tempfile.mkdtemp(prefix="sdrtpu_scan_")
    # fast FFT cadence (one line per 4096 samples) keeps the scan loop
    # responsive and the block quantum sane (~0.5 s at 1 Msps)
    fe = IQFrontend(
        fs, {"scan": VfoConfig(args.start, args.mode)},
        spectrum=True, fft_size=4096, fft_rate=fs / 4096,
    )

    state = {"recorder": None, "hits": [], "audio_rate": 48000.0}

    def on_tune(freq):
        if state.get("rx") is not None:  # Scanner tunes once in __init__
            state["rx"].retune("scan", freq)  # live state-table swap
        if state["recorder"] is not None:
            state["recorder"].close()
            state["recorder"] = None

    scanner = Scanner(
        args.start, args.stop, args.interval,
        vfo_bandwidth=25_000.0, level_db=args.level,
        linger_time=0.5, tuning_time=0.2, tune_callback=on_tune,
    )

    def on_spectrum(lines):
        dt = 4096 / fs
        was = scanner.receiving
        for line in np.atleast_2d(lines):
            scanner.push_spectrum(line, 0.0, fs, dt)
        if scanner.receiving and state["recorder"] is None:
            path = os.path.join(
                out_dir, f"hit_{int(scanner.current):+d}Hz.wav"
            )
            state["recorder"] = Recorder(path, int(state["audio_rate"]),
                                         mode="audio")
            state["hits"].append(scanner.current)
            print(f"activity at {scanner.current / 1e3:+.0f} kHz -> {path}",
                  flush=True)
        elif was and not scanner.receiving and state["recorder"] is not None:
            print(f"closed {state['recorder'].close()}", flush=True)
            state["recorder"] = None

    def on_audio(a):
        if state["recorder"] is not None:
            state["recorder"].push(a)  # Recorder.push takes (2, n) audio

    rx = Receiver(fe, audio_sinks={"scan": on_audio},
                  spectrum_sink=on_spectrum)
    state["rx"] = rx
    rx.warmup()
    for i in range(0, len(iq) - rx.block_len + 1, rx.block_len):
        rx.push(iq[i: i + rx.block_len])
    rx.flush()
    if state["recorder"] is not None:
        state["recorder"].close()

    hits = sorted(set(round(h) for h in state["hits"]))
    print(f"scan complete: {len(hits)} active frequencies {hits}", flush=True)
    if args.selftest:
        ok = (-300_000 in hits) and (200_000 in hits)
        recs = [f for f in os.listdir(out_dir) if f.endswith(".wav")]
        ok = ok and len(recs) >= 2
        # validate recording CONTENT, not just existence: stereo 48 kHz
        # frames with real audio energy (a transposed write would produce
        # a ~12000-channel 2-frame file)
        from sdrtpu.io import wav as wavmod

        for f in recs:
            info, data = wavmod.read_wav(os.path.join(out_dir, f))
            ok = ok and info.channels == 2 and info.samplerate == 48000
            ok = ok and data.shape[0] > 4800  # >0.1 s of frames
            ok = ok and float(np.std(data)) > 1e-4
        print("SELFTEST", "OK" if ok else "FAILED", f"recordings={recs}",
              flush=True)
        return 0 if ok else 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
