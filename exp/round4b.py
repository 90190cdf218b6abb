"""Round-4b micro-experiments: next levers after the split-FFT/envelope wins.

1. pilot FIR's single-FFT plan: (64, 16384) direct vs four_step_fft
2. ifft vs fft rate at the channelizer's (C*P, nif) shape
3. chunk build: current (concat+trim+reshape+swapaxes) vs direct
   transposed build via a one-time rows2.T
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sdrtpu.roofline import slope_time
from sdrtpu.kernels.fftspec import four_step_fft


def log(*a):
    print(*a, flush=True)


def tm(name, fn, planes, pts):
    re0, im0 = planes

    def step(st, salt):
        return st, fn(jax.lax.complex(re0 + salt, im0))

    t = slope_time(step, jnp.float32(0))
    log(f"  {name:46s} {t*1e3:8.4f} ms  {pts/t/1e9:7.2f} Gpts/s")
    return t


def mk(rng, shape):
    return (jax.device_put(rng.standard_normal(shape).astype(np.float32)),
            jax.device_put(rng.standard_normal(shape).astype(np.float32)))


def main():
    rng = np.random.default_rng(0)

    # 1. pilot-shaped FFTs
    for shape in [(64, 16384), (32, 16384)]:
        planes = mk(rng, shape)
        pts = shape[0] * shape[1]
        tm(f"fft direct {shape}", jnp.fft.fft, planes, pts)
        tm(f"ifft direct {shape}", jnp.fft.ifft, planes, pts)
        for n1 in (64, 128, 256):
            tm(f"four_step {shape} n1={n1}",
               lambda x, n1=n1: four_step_fft(x, n1=n1), planes, pts)

    # 2. channelizer ifft shapes
    for shape in [(8000, 128), (64, 125, 128)]:
        planes = mk(rng, shape)
        pts = int(np.prod(shape))
        tm(f"fft {shape}", jnp.fft.fft, planes, pts)
        tm(f"ifft {shape}", jnp.fft.ifft, planes, pts)

        def ifft_via_fft(x):
            y = jnp.fft.fft(x)
            n = x.shape[-1]
            rev = jnp.concatenate([y[..., :1], jnp.flip(y[..., 1:], -1)], -1)
            return rev * (1.0 / n)

        tm(f"ifft-as-fft+flip {shape}", ifft_via_fft, planes, pts)

    # 3. chunk build variants (64-VFO plan shapes)
    P, V, nfft, R, nif = 125, 20000, 25600, 200, 128
    n = P * V
    tpad = 5601
    ext_planes = mk(rng, (n + tpad - 1,))

    def build_current(ext):
        Q = -(-nfft // V)
        rows_n = P + Q - 1
        xp = jnp.pad(ext, (0, rows_n * V - ext.shape[-1]))
        rows = xp.reshape(rows_n, V)
        chunks = jnp.concatenate(
            [jax.lax.dynamic_slice_in_dim(rows, q, P, axis=0)
             for q in range(Q)], axis=-1)[:, :nfft]
        cp = chunks.reshape(P, nif, R)
        return jnp.swapaxes(cp, -1, -2)  # (P, R, nif)

    def build_direct(ext):
        # ct[p, s, q] = ext[p*V + q*R + s]; V = R*Vr ->
        # rows2 = ext.reshape(-1, R); ct[p, s, q] = rows2[p*Vr + q, s]
        Vr = V // R
        blocks = -(-(ext.shape[-1]) // V) + 1
        xp = jnp.pad(ext, (0, blocks * V - ext.shape[-1]))
        rt = xp.reshape(-1, R).T  # (R, total_rows)
        rt3 = rt.reshape(R, blocks, V // R)
        A = -(-nif // Vr)  # row-blocks spanned by one chunk's q range
        Y = jnp.concatenate(
            [jax.lax.dynamic_slice_in_dim(rt3, a, P, axis=1)
             for a in range(A)], axis=-1)[:, :, :nif]  # (R, P, nif)
        return Y

    re0, im0 = ext_planes

    def step_cur(st, salt):
        return st, build_current(jax.lax.complex(re0 + salt, im0))

    def step_dir(st, salt):
        return st, build_direct(jax.lax.complex(re0 + salt, im0))

    t1 = slope_time(step_cur, jnp.float32(0))
    log(f"  chunk build current (P,R,nif)                 {t1*1e3:8.4f} ms")
    t2 = slope_time(step_dir, jnp.float32(0))
    log(f"  chunk build direct (R,P,nif)                  {t2*1e3:8.4f} ms")

    # combined: build + fft over q
    def full_cur(x):
        return jnp.fft.fft(build_current(x))

    def full_dir(x):
        return jnp.fft.fft(build_direct(x))

    tm("build_cur + fft", full_cur, ext_planes, P * nfft)
    tm("build_dir + fft", full_dir, ext_planes, P * nfft)


if __name__ == "__main__":
    main()
