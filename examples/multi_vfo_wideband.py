"""Flagship pipeline: N simultaneous WBFM receivers off one wideband block.

This is the benchmark configuration (bench.py) as a minimal library
example: 10 Msps wideband in -> FFT channelizer -> 8 stereo WFM
receivers -> 48 kHz audio + a 65536-bin waterfall branch.
"""

import sys

import numpy as np
import jax

from sdrtpu.apps.wbfm_pipeline import WbfmMultiVfoPipeline
from sdrtpu.graph.compile import complexify, realify


def main() -> int:
    fs = 10e6
    offsets = np.linspace(-4e6, 4e6, 8)
    m = WbfmMultiVfoPipeline.block_multiple(fs)
    block = (500_000 // m) * m
    pipe = WbfmMultiVfoPipeline(offsets, fs, block, spectrum=True)

    # synthetic wideband: one FM station per VFO offset
    t = np.arange(block) / fs
    x = np.zeros(block, np.complex64)
    for i, fc in enumerate(offsets):
        msg = np.sin(2 * np.pi * (500.0 + 300.0 * i) * t)
        phase = np.cumsum(2 * np.pi * 75000.0 * msg / fs)
        x += (0.1 * np.exp(1j * (2 * np.pi * fc * t + phase))).astype(
            np.complex64
        )

    @jax.jit
    def step(rstate, re, im):
        st, (audio, spec) = pipe(complexify(rstate), jax.lax.complex(re, im))
        return realify(st), (audio, spec)

    rstate = realify(pipe.init_state())
    for _ in range(3):  # stream a few blocks
        rstate, (audio, spec) = step(
            rstate, x.real.astype(np.float32), x.imag.astype(np.float32)
        )
    audio = np.asarray(audio)  # (2, 8, n48k)
    spec = np.asarray(spec)  # (frames, 65536) dB
    print(f"audio {audio.shape}, rms per VFO:",
          np.round(audio.std(axis=(0, 2)), 3))
    print(f"waterfall {spec.shape}, peak {spec.max():.1f} dB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
