"""Headless server + remote client (SDR++ server-protocol parity).

Starts an in-process `SdrppServer` streaming a synthetic capture, then
connects an `SdrppClient` — the same protocol SDR++'s
``sdrpp_server_source`` speaks: sample-rate query, start/stop, baseband
packets (i16 PCM with scale headers, optional zstd), and the SmGui
remote-UI round trip.
"""

import sys
import threading
import time

import numpy as np

from sdrtpu.io.compression import PCM_TYPE_I16
from sdrtpu.io.server_protocol import SdrppClient, SdrppServer


def main() -> int:
    fs = 250_000
    t = np.arange(1 << 16) / fs
    iq = (0.5 * np.exp(2j * np.pi * 12000.0 * t)).astype(np.complex64)

    server = SdrppServer("127.0.0.1", 0, samplerate=float(fs))
    stop = threading.Event()

    def feeder():
        pos = 0
        while not stop.is_set():
            if not server.running:
                time.sleep(0.02)
                continue
            block = iq[pos : pos + 8192]
            pos = pos + 8192 if len(block) == 8192 else 0
            if len(block) == 8192:
                server.send_baseband(block)
                time.sleep(8192 / fs)

    threading.Thread(target=feeder, daemon=True).start()

    cli = SdrppClient("127.0.0.1", server.port)
    print(f"server samplerate: {cli.get_samplerate():.0f} Hz")
    cli.set_sample_type(PCM_TYPE_I16)
    cli.start()
    block = cli.recv_baseband(timeout=5.0)
    if block is None:
        print("no baseband received within 5 s", file=sys.stderr)
        return 1
    print(f"received baseband block: {len(block)} complex samples, "
          f"rms {np.sqrt(np.mean(np.abs(block) ** 2)):.3f}")
    cli.stop()
    stop.set()
    cli.close()
    server.close()
    print("OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
