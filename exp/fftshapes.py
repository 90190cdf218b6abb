"""Round-4 experiment: batched FFT throughput vs shape on the axon v5e.

The 64-VFO channelizer's forward FFT (125, 25600) measured 9.7 Gpts/s —
the dominant stage.  Candidates:
  - direct (125, 25600) [baseline]
  - polyphase split: (125*200, 128) small FFTs (+ the transpose to get
    the q axis last) — the Cooley-Tukey split whose twiddles fold into
    the alias-fold table for free
  - alternate nfft sizes
Prints pts/s for each.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sdrtpu.roofline import slope_time


def log(*a):
    print(*a, flush=True)


def time_fn(name, fn, re0, im0, pts):
    def step(st, salt):
        out = fn(jax.lax.complex(re0 + salt, im0))
        return st, out

    t = slope_time(step, jnp.float32(0))
    log(f"  {name:44s} {t*1e3:8.4f} ms  {pts/t/1e9:7.2f} Gpts/s")
    return t


def main():
    rng = np.random.default_rng(0)

    def mk(shape):
        re = jax.device_put(rng.standard_normal(shape).astype(np.float32))
        im = jax.device_put(rng.standard_normal(shape).astype(np.float32))
        return re, im

    # baseline: the 64-VFO plan's forward FFT
    for shape in [(125, 25600), (250, 25600), (125, 32000), (50, 51200),
                  (125, 5120), (1000, 5120)]:
        re, im = mk(shape)
        pts = shape[0] * shape[1]
        time_fn(f"fft{shape}", jnp.fft.fft, re, im, pts)

    # polyphase small-FFT split: (P, nfft) -> (P, nif, R) -> T -> fft(last)
    for (P, nfft, R) in [(125, 25600, 200), (125, 5120, 40)]:
        nif = nfft // R
        re, im = mk((P, nfft))
        pts = P * nfft

        def poly_fft(x, P=P, nif=nif, R=R):
            xp = x.reshape(P, nif, R)
            xt = jnp.swapaxes(xp, -1, -2)  # (P, R, nif)
            return jnp.fft.fft(xt)

        time_fn(f"poly_T+fft ({P}x{R}x{nif})", poly_fft, re, im, pts)

        # without the transpose (pure small-FFT rate; wrong math, right cost)
        re2, im2 = mk((P * R, nif))

        def small_fft(x):
            return jnp.fft.fft(x)

        time_fn(f"small fft ({P*R}x{nif})", small_fft, re2, im2, pts)

        # transpose alone
        def tr_only(x, P=P, nif=nif, R=R):
            return jnp.swapaxes(x.reshape(P, nif, R), -1, -2) * 1.000001

        time_fn(f"transpose only ({P}x{nif}x{R})", tr_only, re, im, pts)

    # DFT-as-matmul for nif=128: (P*R, nif) @ (nif, nif) complex
    for (B, nif) in [(25000, 128), (5000, 128)]:
        re, im = mk((B, nif))
        W = np.exp(-2j * np.pi * np.outer(np.arange(nif), np.arange(nif)) / nif)
        Wre = jax.device_put(W.real.astype(np.float32))
        Wim = jax.device_put(W.imag.astype(np.float32))

        def dft_mm(x):
            Wc = jax.lax.complex(Wre, Wim)
            return x @ Wc

        time_fn(f"DFT matmul ({B}x{nif})", dft_mm, re, im, B * nif)


if __name__ == "__main__":
    main()
