"""Round-4c: device-side demod quality — TPU vs CPU on the same input.

PARITY.md's SINAD/separation numbers are CPU-measured; on TPU the
channelizer fold and the new matmul FIRs run on the MXU, whose einsum
precision differs from CPU f32.  This runs the flagship 8-VFO pipeline
on ONE synthesized stereo station and prints separation + SINAD of the
demodulated channel, so the TPU numbers can sit next to the CPU ones.

Usage:
  python exp/tpuq.py                 # TPU (axon)
  SDRTPU_TPUQ_CPU=1 python exp/tpuq.py   # CPU reference
Scratch instrumentation; not shipped.
"""

import os
import sys

import numpy as np
import jax

if os.environ.get("SDRTPU_TPUQ_CPU"):
    jax.config.update("jax_platforms", "cpu")
_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from sdrtpu.graph.compile import complexify, realify
from sdrtpu.apps.wbfm_pipeline import WbfmMultiVfoPipeline


def log(*a):
    print(*a, flush=True)


def make_station(fs, offset, n, phi0=0.0, fl=1000.0, fr=2500.0, dev=75000.0):
    t = np.arange(n) / fs
    L = np.sin(2 * np.pi * fl * t)
    R = np.sin(2 * np.pi * fr * t)
    pilot = 0.1 * np.sin(2 * np.pi * 19000.0 * t)
    sub = 0.5 * (L - R) * np.sin(2 * np.pi * 38000.0 * t)
    mpx = 0.45 * (L + R) + pilot + 0.9 * sub
    phase = phi0 + np.cumsum(2 * np.pi * dev * mpx / fs)
    bb = np.exp(1j * phase)
    return (bb * np.exp(2j * np.pi * offset * t)).astype(np.complex64), phase[-1]


def tone_power(x, f, fs, bw=60.0):
    n = len(x)
    w = np.hanning(n)
    spec = np.abs(np.fft.rfft(x * w)) ** 2
    freqs = np.fft.rfftfreq(n, 1 / fs)
    return spec[(freqs > f - bw) & (freqs < f + bw)].sum()


def sinad_db(x, f_tone, fs):
    n = len(x)
    w = np.hanning(n)
    spec = np.abs(np.fft.rfft(x * w)) ** 2
    freqs = np.fft.rfftfreq(n, 1 / fs)
    sig = (freqs > f_tone - 60) & (freqs < f_tone + 60)
    rest = ~sig & (freqs > 100) & (freqs < 15000)
    return 10 * np.log10(spec[sig].sum() / spec[rest].sum())


def main():
    fs = 10e6
    m = WbfmMultiVfoPipeline.block_multiple(fs)
    block_len = (500_000 // m) * m
    offsets = np.linspace(-0.4 * fs, 0.4 * fs, 8)
    pipe = WbfmMultiVfoPipeline(offsets, fs, block_len, spectrum=False)
    ch = 3
    n_blocks = 8
    phi = 0.0
    blocks = []
    for b in range(n_blocks):
        t0 = b * block_len
        t = (np.arange(block_len) + t0) / fs
        # continuous-phase station at channel ch (offset known)
        Lw = np.sin(2 * np.pi * 1000.0 * t)
        Rw = np.sin(2 * np.pi * 2500.0 * t)
        pilot = 0.1 * np.sin(2 * np.pi * 19000.0 * t)
        sub = 0.5 * (Lw - Rw) * np.sin(2 * np.pi * 38000.0 * t)
        mpx = 0.45 * (Lw + Rw) + pilot + 0.9 * sub
        phase = phi + np.cumsum(2 * np.pi * 75000.0 * mpx / fs)
        phi = phase[-1]
        bb = np.exp(1j * phase) * np.exp(2j * np.pi * offsets[ch] * t)
        blocks.append(bb.astype(np.complex64))

    @jax.jit
    def step(rst, re, im):
        st, a = pipe(complexify(rst), jax.lax.complex(re, im))
        return realify(st), a

    rst = realify(pipe.init_state())
    outs = []
    for b in blocks:
        re = jax.device_put(b.real.astype(np.float32))
        im = jax.device_put(b.imag.astype(np.float32))
        rst, a = step(rst, re, im)
        outs.append(np.asarray(a))
    a = np.concatenate(outs, axis=-1)  # (2, 8, n)
    afs = 48000.0
    l = a[0, ch][4000:]
    r = a[1, ch][4000:]
    sep_l = 10 * np.log10(tone_power(l, 1000, afs) / tone_power(l, 2500, afs))
    sep_r = 10 * np.log10(tone_power(r, 2500, afs) / tone_power(r, 1000, afs))
    s_l = sinad_db(l, 1000.0, afs)
    s_r = sinad_db(r, 2500.0, afs)
    plat = jax.devices()[0].platform
    log(f"platform={plat} separation L={sep_l:.1f} R={sep_r:.1f} dB  "
        f"SINAD L={s_l:.1f} R={s_r:.1f} dB")
    # leakage into a silent channel (cross-channel isolation)
    iso = 10 * np.log10(
        np.mean(a[0, ch][4000:] ** 2) / max(np.mean(a[0, 0][4000:] ** 2), 1e-30)
    )
    log(f"channel isolation (ch{ch} power / ch0 power) = {iso:.1f} dB")
    save = os.environ.get("SDRTPU_TPUQ_SAVE")
    if save:
        np.save(save, a)
        log(f"saved audio -> {save}")
    other = os.environ.get("SDRTPU_TPUQ_DIFF")
    if other and os.path.exists(other):
        b = np.load(other)
        d = a[:, ch] - b[:, ch]
        rel = np.sqrt(np.mean(d[:, 4000:] ** 2) / np.mean(b[:, ch, 4000:] ** 2))
        log(f"audio diff vs {other}: ch{ch} rel RMS {rel:.3e} "
            f"({20*np.log10(max(rel,1e-30)):.1f} dB)")


if __name__ == "__main__":
    main()
