"""Live end-to-end radio: network IQ -> fused receiver -> speakers.

The full reference listening path (``network_source`` -> IQFrontEnd ->
radio WFM -> ``audio_sink``) as one script:

    TCP IQ ingest (native C++ pump + SPSC ring)
      -> Receiver (one jitted frontend+VFO+demod program)
        -> AudioSink (512-frame packets -> sounddevice/ALSA, or the
           real-time-paced headless backend when no audio HW exists)

Run against any i16 IQ stream (e.g. sdrtpu's IqExporter, rtl_tcp piped
through netcat, or another SDR feeding raw interleaved int16):

    python examples/live_radio.py --port 5000 --rate 1000000 \
        --offset 250000 --mode wfm

With ``--selftest N`` the script feeds itself a synthesized WFM station
at real-time rate over a loopback socket for N seconds and reports the
sustained real-time factor and audio pacing stats (the round-trip proof
that the chain holds real time end to end).
"""

import argparse
import sys
import threading
import time

import numpy as np

from sdrtpu.apps.receiver import IQFrontend, Receiver, VfoConfig
from sdrtpu.io.audio_sink import AudioSink
from sdrtpu.io.net import IqExporter, NetworkSource


def make_station(fs: float, offset: float, n: int, t0: int = 0,
                 mod_phase: float = 0.0) -> tuple[np.ndarray, float]:
    """Synthesized stereo WFM station at `offset` Hz (pilot + L-R).

    ``mod_phase`` carries the FM modulation-phase integral across chunked
    calls (returned as the second element) — restarting the cumsum at
    zero per chunk would put a tens-of-radians phase step at every chunk
    boundary (a click train + splatter instead of a continuous station).
    """
    t = (t0 + np.arange(n)) / fs
    left = np.sin(2 * np.pi * 440.0 * t)
    right = np.sin(2 * np.pi * 1200.0 * t)
    mpx = (0.45 * (left + right) / 2 + 0.1 * np.sin(2 * np.pi * 19000.0 * t)
           + 0.45 * ((left - right) / 2) * np.sin(2 * np.pi * 38000.0 * t))
    phase = mod_phase + np.cumsum(2 * np.pi * 75000.0 * mpx / fs)
    iq = (0.6 * np.exp(1j * (2 * np.pi * offset * t + phase))).astype(
        np.complex64
    )
    return iq, float(phase[-1] % (2 * np.pi))


def feeder(port: int, fs: float, offset: float, seconds: float) -> None:
    """Real-time-paced loopback transmitter (the 'antenna')."""
    exp = IqExporter("tcp-client", "127.0.0.1", port)
    chunk = int(fs / 50)  # 20 ms sends
    sent = 0
    mod_phase = 0.0
    start = time.monotonic()
    while sent < seconds * fs:
        due = start + sent / fs
        now = time.monotonic()
        if due > now:
            time.sleep(due - now)
        iq, mod_phase = make_station(fs, offset, chunk, t0=sent,
                                     mod_phase=mod_phase)
        exp.send(iq)
        sent += chunk
    exp.close()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--rate", type=float, default=1_000_000.0)
    ap.add_argument("--offset", type=float, default=250_000.0)
    ap.add_argument("--mode", default="wfm")
    ap.add_argument("--squelch", type=float, default=None)
    ap.add_argument("--selftest", type=float, default=0.0,
                    help="feed a synthetic station for N seconds")
    ap.add_argument("--platform", default="auto",
                    choices=["auto", "cpu", "default"],
                    help="'cpu' forces the CPU backend; 'auto' (default) "
                         "does so only for --selftest (a remote-tunneled "
                         "TPU dev backend pays per-dispatch RTT that "
                         "breaks small-block interactive latency; local "
                         "production TPUs don't)")
    args = ap.parse_args()

    import jax

    if args.platform == "cpu" or (args.platform == "auto" and args.selftest):
        jax.config.update("jax_platforms", "cpu")
    print(f"jax devices: {jax.devices()}", flush=True)

    src = NetworkSource("tcp", "127.0.0.1" if args.selftest else "0.0.0.0",
                        args.port)
    print(f"listening for i16 IQ on tcp port {src.port}", flush=True)

    fe = IQFrontend(
        args.rate,
        {"v0": VfoConfig(args.offset, args.mode, squelch_db=args.squelch)},
        spectrum=False,
    )
    sink = AudioSink(48000.0)
    rx = Receiver(fe, audio_sinks={"v0": sink})
    t0 = time.monotonic()
    rx.warmup()
    print(f"receiver compiled in {time.monotonic() - t0:.1f} s", flush=True)

    if args.selftest:
        threading.Thread(
            target=feeder, args=(src.port, args.rate, args.offset,
                                 args.selftest),
            daemon=True,
        ).start()

    pushed = 0
    t_start = None
    deadline = None
    try:
        while True:
            iq = src.read(timeout=1.0)
            if iq is None:
                if deadline and time.monotonic() > deadline:
                    break
                continue
            if t_start is None:
                t_start = time.monotonic()
                if args.selftest:
                    deadline = t_start + args.selftest + 5.0
            rx.push(iq)
            pushed += len(iq)
            if args.selftest and pushed >= args.selftest * args.rate:
                break
    except KeyboardInterrupt:
        pass
    rx.flush()
    elapsed = time.monotonic() - (t_start or time.monotonic())
    sink.close()
    src.close()
    rtf = pushed / args.rate / max(elapsed, 1e-9)
    be = sink.backend
    print(
        f"processed {pushed} samples ({pushed / args.rate:.1f} s of IQ) in "
        f"{elapsed:.1f} s -> real-time factor {rtf:.2f}; "
        f"audio packets {sink.packets}, underruns "
        f"{getattr(be, 'underruns', 'n/a')}",
        flush=True,
    )
    if args.selftest:
        ok = rtf > 0.95 and getattr(be, "underruns", 0) <= 2
        print("SELFTEST", "OK" if ok else "FAILED", flush=True)
        return 0 if ok else 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
