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


def feeder(port: int, fs: float, offsets, seconds: float) -> None:
    """Real-time-paced loopback transmitter (the 'antenna')."""
    if np.isscalar(offsets):
        offsets = [offsets]
    exp = IqExporter("tcp-client", "127.0.0.1", port)
    chunk = int(fs / 50)  # 20 ms sends
    sent = 0
    phases = [0.0] * len(offsets)
    start = time.monotonic()
    while sent < seconds * fs:
        due = start + sent / fs
        now = time.monotonic()
        if due > now:
            time.sleep(due - now)
        iq = np.zeros(chunk, np.complex64)
        for i, off in enumerate(offsets):
            s_i, phases[i] = make_station(fs, off, chunk, t0=sent,
                                          mod_phase=phases[i])
            iq += s_i / len(offsets)
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
    ap.add_argument("--block-ms", type=float, default=0.0,
                    help="force the dispatch block size (ms of signal); "
                         "0 = the Receiver default (~250k samples)")
    ap.add_argument("--async-fetch", default="0",
                    help="overlap device->host fetches: worker count, or "
                         "'auto' to size from the measured RTT (use on "
                         "remote-tunneled TPUs; 0 = synchronous)")
    ap.add_argument("--exercise", action="store_true",
                    help="with --selftest: mid-stream retune to a second "
                         "station at 1/3 of the run and a WFM->NFM->WFM "
                         "demod switch at 2/3 (the reference's live "
                         "reconfiguration, radio_module.h:402-416)")
    ap.add_argument("--json", default=None,
                    help="write the session record (RTF, latencies, "
                         "underruns, reconfig events) to this path")
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
        {"v0": VfoConfig(args.offset, args.mode, squelch_db=args.squelch,
                         stereo=True)},
        spectrum=False,
    )
    # ~150 ms jitter buffer when fetches ride the remote tunnel (the
    # delivery latency is ~2x RTT with multi-ms jitter)
    sink = AudioSink(48000.0,
                     latency_packets=(14 if args.async_fetch != "0" else 4))
    try:
        af = int(args.async_fetch)
    except ValueError:
        af = args.async_fetch  # "auto"
    block_len = None
    if args.block_ms:
        m = fe.block_multiple()
        block_len = max(1, round(args.rate * args.block_ms / 1e3 / m)) * m
    rx = Receiver(fe, block_len=block_len, audio_sinks={"v0": sink},
                  async_fetch=af)
    t0 = time.monotonic()
    rx.warmup()
    compile_s = time.monotonic() - t0
    print(f"receiver compiled in {compile_s:.1f} s "
          f"(block {rx.block_len} = {rx.block_len / args.rate * 1e3:.1f} ms, "
          f"async_fetch={rx.async_fetch})", flush=True)
    events = []
    if args.exercise:
        # pre-warm both demod programs so the mid-stream switch is the
        # reference-style no-compile reconfiguration (XLA cache story,
        # VERDICT r4 #8); latencies recorded either way
        t0 = time.monotonic()
        dt_n = rx.set_mode("v0", "nfm")
        dt_w = rx.set_mode("v0", args.mode)
        events.append({"event": "prewarm_mode_programs",
                       "nfm_s": round(dt_n, 2), "wfm_s": round(dt_w, 2)})
        print(f"mode programs warmed: nfm {dt_n:.2f}s, back {dt_w:.2f}s",
              flush=True)

    offset2 = args.offset + args.rate * 0.2
    if args.selftest:
        threading.Thread(
            target=feeder, args=(src.port, args.rate,
                                 [args.offset, offset2] if args.exercise
                                 else [args.offset],
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
            if args.exercise and args.selftest:
                third = args.selftest * args.rate / 3
                if pushed >= third and not any(
                        e["event"] == "retune" for e in events):
                    t0 = time.monotonic()
                    rx.retune("v0", offset2)
                    events.append({"event": "retune",
                                   "to_offset_hz": offset2,
                                   "at_s": round(pushed / args.rate, 1),
                                   "latency_s": round(
                                       time.monotonic() - t0, 4)})
                    print(f"retuned to {offset2/1e3:.0f} kHz "
                          f"({events[-1]['latency_s']*1e3:.1f} ms)",
                          flush=True)
                if pushed >= 2 * third and not any(
                        e["event"] == "demod_switch" for e in events):
                    dt1 = rx.set_mode("v0", "nfm")
                    dt2 = rx.set_mode("v0", args.mode)
                    events.append({"event": "demod_switch",
                                   "at_s": round(pushed / args.rate, 1),
                                   "to_nfm_s": round(dt1, 3),
                                   "back_s": round(dt2, 3)})
                    print(f"demod switch: ->nfm {dt1:.3f}s, "
                          f"->{args.mode} {dt2:.3f}s", flush=True)
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
    if args.json:
        import json

        rec = {
            "metric": "live_session",
            "platform": str(jax.devices()[0].platform),
            "rate": args.rate,
            "block_len": rx.block_len,
            "block_ms_of_signal": round(rx.block_len / args.rate * 1e3, 2),
            "async_fetch": rx.async_fetch,
            "seconds_of_iq": round(pushed / args.rate, 1),
            "wall_s": round(elapsed, 1),
            "rtf_sustained": round(rtf, 3),
            "audio_packets": sink.packets,
            "underruns": getattr(be, "underruns", None),
            "compile_s": round(compile_s, 1),
            "events": events,
        }
        with open(args.json, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"session record -> {args.json}", flush=True)
    if args.selftest:
        max_under = max(2, int(0.005 * max(sink.packets, 1)))
        ok = rtf > 0.95 and getattr(be, "underruns", 0) <= max_under
        print("SELFTEST", "OK" if ok else "FAILED", flush=True)
        return 0 if ok else 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
