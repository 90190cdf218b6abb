"""RyFi data-modem link demo: packets -> QPSK baseband -> noisy channel
-> packets (the reference's ``ryfi_decoder`` capability end to end).

    python examples/ryfi_link.py [--esn0 8] [--offset-hz 100] [--baud 20000]

Sends a few packets (one spanning two frames), impairs the channel
(AWGN at the requested Es/N0, carrier offset, phase rotation), and
receives them through the full PSK4 chain -> rotation-searching
deframer -> Viterbi+RS -> cross-frame reassembly.  The wire format is
bit-compatible with SDR++'s RyFi (docs/PARITY.md).
"""

import argparse
import sys

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--esn0", type=float, default=8.0)
    ap.add_argument("--offset-hz", type=float, default=100.0)
    ap.add_argument("--baud", type=float, default=20000.0)
    ap.add_argument("--sps", type=int, default=4)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from sdrtpu.decoders.ryfi import RyfiReceiver, RyfiTransmitter

    fs = args.baud * args.sps
    rng = np.random.default_rng(7)
    payloads = [b"hello over the air",
                bytes(rng.integers(0, 256, 1500).astype(np.uint8)),  # spans frames
                b"last packet"]

    tx = RyfiTransmitter(args.baud, fs)
    bb = np.concatenate([tx.idle(), tx.send(payloads), tx.idle()])
    print(f"TX: {len(payloads)} packets -> {bb.size} baseband samples "
          f"({bb.size / fs:.2f} s at {fs / 1e3:.0f} ksps)")

    es = np.mean(np.abs(bb) ** 2) * args.sps
    sigma = np.sqrt(es / 10 ** (args.esn0 / 10) / 2)
    t = np.arange(bb.size) / fs
    y = (bb * np.exp(1j * (0.7 + 2 * np.pi * args.offset_hz * t))
         + sigma * (rng.standard_normal(bb.size)
                    + 1j * rng.standard_normal(bb.size))).astype(np.complex64)

    rx = RyfiReceiver(args.baud, fs)
    got = []
    B = 16384
    for i in range(0, len(y) // B * B, B):
        got += rx.process(y[i:i + B])
    print(f"RX: frames decoded {rx.frames_decoded}, failed "
          f"{rx.frames_failed}, RS errors corrected {rx.rs_errors}")
    for p in got:
        label = p.decode() if all(32 <= b < 127 for b in p[:20]) else \
            f"<{len(p)} binary bytes>"
        print(f"  packet: {label}")
    ok = got == payloads
    print("LINK", "OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
