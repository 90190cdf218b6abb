"""Round-4c: matmul-FIR precision on the MXU — speed AND accuracy.

jnp.einsum with DEFAULT precision may run f32 contractions as bf16
passes on TPU; the pilot bandpass / deemphasis parity floors need to
know.  Measures, at the flagship shapes, mm-DEFAULT vs mm-HIGHEST vs
fft against a float64 host reference.

Usage: python exp/mmprec.py.  Scratch instrumentation; not shipped.
"""

import os
import sys
import functools

import numpy as np
import jax
import jax.numpy as jnp

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sdrtpu.roofline import slope_time
from sdrtpu.kernels import taps as tapsmod
from sdrtpu.kernels.fir import fft_correlate_valid, matmul_correlate_valid


def log(*a):
    print(*a, flush=True)


def bench_case(name, x_np, taps, ref64):
    x = jax.device_put(x_np)

    def err(y):
        y = np.asarray(y, np.float64)
        e = np.max(np.abs(y - ref64)) / np.max(np.abs(ref64))
        return e

    for prec_name, prec in (("default", None), ("high", "high"),
                            ("highest", "highest")):
        ctx = (jax.default_matmul_precision(prec)
               if prec else _null())
        with ctx:
            f = jax.jit(functools.partial(matmul_correlate_valid, taps=taps))
            y = f(x)
            e = err(y)

            def step(st, salt):
                return st, f(x + salt)

            t = slope_time(step, jnp.float32(0))
        log(f"  {name} mm/{prec_name:8s} {t*1e3:8.4f} ms  relerr {e:.2e}")

    ff = jax.jit(functools.partial(fft_correlate_valid, taps=taps))
    y = ff(x)
    e = err(y)

    def stepf(st, salt):
        return st, ff(x + salt)

    t = slope_time(stepf, jnp.float32(0))
    log(f"  {name} fft        {t*1e3:8.4f} ms  relerr {e:.2e}")


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def main():
    rng = np.random.default_rng(0)

    # pilot shape: (64, 12816) real, 317 taps
    ptaps = 2.0 * np.real(tapsmod.band_pass(18750.0, 19250.0, 3000.0,
                                            250000.0, odd_tap_count=True))
    T = len(ptaps)
    x = rng.standard_normal((64, 12500 + T - 1)).astype(np.float32)
    # np.correlate(a, v)[k] = sum_t a[k+t]*v[t] — same orientation as
    # correlate_valid; no flip
    ref = np.stack([
        np.correlate(row.astype(np.float64), ptaps.astype(np.float64),
                     mode="valid")
        for row in x
    ])
    log(f"pilot taps T={T}")
    bench_case("pilot(64,12.5k)", x, ptaps, ref)

    # deemph shape: (2, 64, 2459) real, 60 taps
    alpha = (1.0 / 48000.0) / (50e-6 + 1.0 / 48000.0)
    a = 1.0 - alpha
    Tde = int(np.ceil(np.log(1e-9) / np.log(a)))
    k = np.arange(Tde)
    dtaps = (alpha * a ** (Tde - 1 - k)).astype(np.float32)
    x2 = rng.standard_normal((2, 64, 2400 + Tde - 1)).astype(np.float32)
    ref2 = np.stack([
        np.stack([
            np.correlate(row.astype(np.float64),
                         dtaps.astype(np.float64), mode="valid")
            for row in ch
        ]) for ch in x2
    ])
    log(f"deemph taps T={Tde}")
    bench_case("deemph(128,2.4k)", x2, dtaps, ref2)


if __name__ == "__main__":
    main()
