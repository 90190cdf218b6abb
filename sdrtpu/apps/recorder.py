"""Recorder — ``misc_modules/recorder`` capability.

Records demodulated audio or raw baseband to WAV with SDR++-style filename
templates ($YEAR/$MONTH/.../$FREQ etc., ``recorder/src/main.cpp:44-184``),
silence skipping and a peak meter.  Feed blocks from receiver sinks.
"""

from __future__ import annotations

import datetime
import os

import numpy as np

from ..io import wav


def expand_template(template: str, freq_hz: float, now=None) -> str:
    now = now or datetime.datetime.now()
    repl = {
        "$TYPE": "audio",
        "$YEAR": f"{now.year:04d}",
        "$MONTH": f"{now.month:02d}",
        "$DAY": f"{now.day:02d}",
        "$HOUR": f"{now.hour:02d}",
        "$MIN": f"{now.minute:02d}",
        "$SEC": f"{now.second:02d}",
        "$FREQ": f"{int(freq_hz)}Hz",
    }
    out = template
    for k, v in repl.items():
        out = out.replace(k, v)
    return out


class Recorder:
    """Streaming WAV recorder with silence skip and peak metering."""

    def __init__(
        self,
        path: str,
        samplerate: int,
        mode: str = "audio",  # "audio" (stereo f32 blocks) | "baseband" (IQ)
        sample_type: str = "int16",
        ignore_silence: bool = False,
        silence_threshold: float = 1e-4,
    ):
        self.path = path
        self.samplerate = samplerate
        self.mode = mode
        self.sample_type = sample_type
        self.ignore_silence = ignore_silence
        self.silence_threshold = silence_threshold
        self._chunks: list[np.ndarray] = []
        self.peak = 0.0
        self.recorded_samples = 0

    def push(self, block: np.ndarray) -> None:
        block = np.asarray(block)
        if self.mode == "audio":
            amp = float(np.max(np.abs(block))) if block.size else 0.0
        else:
            amp = float(np.max(np.abs(block))) if block.size else 0.0
        self.peak = max(self.peak * 0.85, amp)  # decaying peak meter
        if self.ignore_silence and amp < self.silence_threshold:
            return
        self._chunks.append(block)
        self.recorded_samples += block.shape[-1]

    def close(self) -> str:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        if self.mode == "audio":
            audio = (
                np.concatenate(self._chunks, axis=-1)
                if self._chunks
                else np.zeros((2, 0), np.float32)
            )
            wav.write_wav(self.path, self.samplerate, audio.T, self.sample_type)
        else:
            iq = (
                np.concatenate(self._chunks)
                if self._chunks
                else np.zeros(0, np.complex64)
            )
            wav.write_iq_wav(self.path, self.samplerate, iq, self.sample_type)
        return self.path

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
