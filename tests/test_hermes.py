"""Hermes/Metis protocol: packet parse/build roundtrip + client loopback."""

import socket
import struct
import threading
import time

import numpy as np

from sdrtpu.io.hermes import (
    CTRL_IQ,
    HermesClient,
    METIS_SIGNATURE,
    PKT_CONTROL,
    PKT_USB,
    SAMPLES_PER_FRAME,
    build_usb_packet,
    parse_usb_packet,
)

RNG = np.random.default_rng(73)


def test_usb_packet_roundtrip():
    iq = (RNG.uniform(-0.9, 0.9, 126) + 1j * RNG.uniform(-0.9, 0.9, 126)).astype(
        np.complex64
    )
    pkt = build_usb_packet(iq)
    back = parse_usb_packet(pkt)
    assert len(back) == 126
    np.testing.assert_allclose(back, iq, atol=2e-7)


def test_client_stream():
    # fake device: waits for start control, then sends USB packets
    dev = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    dev.bind(("127.0.0.1", 0))
    port = dev.getsockname()[1]
    got_ctrl = []

    def device():
        dev.settimeout(3.0)
        try:
            data, addr = dev.recvfrom(2048)
        except socket.timeout:
            return
        sig, ptype, ctrl = struct.unpack(">HBB", data[:4])
        got_ctrl.append((ptype, ctrl))
        iq = (np.ones(126) * (0.5 + 0.25j)).astype(np.complex64)
        for s in range(3):
            dev.sendto(build_usb_packet(iq, seq=s), addr)
        # read any control frames (frequency etc.)
        try:
            while True:
                data, _ = dev.recvfrom(2048)
                if data[2] == PKT_USB:
                    got_ctrl.append(("usb_ctrl", data[8 + 3]))
        except (socket.timeout, OSError):
            pass

    t = threading.Thread(target=device, daemon=True)
    t.start()
    cli = HermesClient(("127.0.0.1", port))
    cli.start()
    cli.set_frequency(7.1e6)
    iq = cli.read(timeout=3.0)
    assert iq is not None and len(iq) >= 126
    np.testing.assert_allclose(iq[:126], 0.5 + 0.25j, atol=1e-6)
    time.sleep(0.6)
    # start sets IQ | NO_WD — the reference always disables the gateware
    # watchdog (hermes.cpp:31) since EP2 frames only flow on retunes
    from sdrtpu.io.hermes import CTRL_NO_WD

    assert (PKT_CONTROL, CTRL_IQ | CTRL_NO_WD) in got_ctrl
    cli.close()
