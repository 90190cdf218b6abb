"""Demodulate a stereo WBFM capture to 48 kHz audio — library quickstart.

Equivalent CLI: sdrtpu --input capture.wav --mode wfm --offset 300e3 \
    --output audio.wav

Synthesizes a capture first so the example is self-contained; point
``CAPTURE`` at a real IQ WAV recording to use your own.
"""

import os
import sys
import tempfile

import numpy as np

from sdrtpu.io import wav
from sdrtpu.apps.receiver import IQFrontend, Receiver, VfoConfig

FS = 2_400_000
STATION_OFFSET = 300_000.0


def synthesize(path: str) -> None:
    n = 1 << 21
    t = np.arange(n) / FS
    left = np.sin(2 * np.pi * 1000.0 * t)
    right = np.sin(2 * np.pi * 2500.0 * t)
    pilot = 0.1 * np.sin(2 * np.pi * 19000.0 * t)
    sub = 0.5 * (left - right) * np.sin(2 * np.pi * 38000.0 * t)
    mpx = 0.45 * (left + right) + pilot + 0.9 * sub
    phase = np.cumsum(2 * np.pi * 75000.0 * mpx / FS)
    iq = 0.5 * np.exp(1j * (2 * np.pi * STATION_OFFSET * t + phase))
    wav.write_iq_wav(path, FS, iq.astype(np.complex64), "float32")


def main() -> int:
    tmp = tempfile.mkdtemp(prefix="sdrtpu_example_")
    capture = os.environ.get("CAPTURE") or os.path.join(tmp, "capture.wav")
    if not os.path.exists(capture):
        synthesize(capture)

    info, iq = wav.read_iq_wav(capture)
    frontend = IQFrontend(
        info.samplerate,
        {"wfm0": VfoConfig(mode="wfm", offset_hz=STATION_OFFSET)},
        spectrum=True,
    )
    audio_out = []
    rx = Receiver(
        frontend,
        audio_sinks={"wfm0": lambda a: audio_out.append(np.asarray(a))},
    )
    rx.push(iq)
    rx.flush()  # dispatches the partial tail block too (trimmed)

    if not audio_out:
        print("capture produced no audio (shorter than one block?)")
        return 1
    audio = np.concatenate(audio_out, axis=-1)  # (2, n) stereo 48 kHz
    out = os.path.join(tmp, "audio.wav")
    wav.write_wav(out, 48000, audio.T)
    print(f"wrote {out}: {audio.shape[1] / 48000:.2f} s of stereo audio")
    return 0


if __name__ == "__main__":
    sys.exit(main())
