"""Round-4c: grouped Pallas chunk builder at the 8-VFO plan (R=40).

Times chunk-formation + forward FFT at the 8-VFO steady-state window
(sub=8 -> P=1000, valid=4000, R=40, nif=128): XLA chunk_matrix+reshape
vs chunk_poly at G=1 (round-4b loser) vs choose_group's G.

Usage: python exp/chunks8.py [--fs 10e6 --nvfo 8]
Scratch instrumentation; not shipped.
"""

import argparse
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sdrtpu.graph.compile import complexify, realify
from sdrtpu.roofline import slope_time
from sdrtpu.apps.wbfm_pipeline import WbfmMultiVfoPipeline
from sdrtpu.kernels.pallas_chunks import choose_group, chunk_poly


def log(*a):
    print(*a, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fs", type=float, default=10e6)
    ap.add_argument("--nvfo", type=int, default=8)
    args = ap.parse_args()

    fs_in, n_vfo = args.fs, args.nvfo
    m = WbfmMultiVfoPipeline.block_multiple(fs_in)
    block_len = (max(500_000, int(fs_in / 20)) // m) * m
    offsets = np.linspace(-0.4 * fs_in, 0.4 * fs_in, n_vfo)
    pipe = WbfmMultiVfoPipeline(offsets, fs_in, block_len, spectrum=True)
    chain = pipe.channelizer.fused
    sub = pipe._subk(256)
    n = block_len * sub
    P = sub * chain.n_chunks
    V, R, nif = chain.valid, chain.ratio, chain.nif
    g_auto = choose_group(chain.n_chunks, V, R, nif)
    log(f"block={block_len} sub={sub} P={P} valid={V} R={R} nif={nif} "
        f"G_auto={g_auto}")

    rng = np.random.default_rng(0)
    ext_len = chain.tpad - 1 + n
    e = (rng.standard_normal(ext_len) + 1j * rng.standard_normal(ext_len)).astype(np.complex64)
    e_re = jax.device_put(e.real.astype(np.float32))
    e_im = jax.device_put(e.imag.astype(np.float32))

    def tm(name, step):
        t = slope_time(step, jnp.float32(0))
        log(f"  {name:28s} {t*1e3:8.4f} ms/window ({t*1e3/sub:.4f} ms/block)")
        return t

    # XLA reference: chunk_matrix + poly_spectrum reshape/transpose + FFT
    def step_xla(st, salt):
        ext = jax.lax.complex(e_re + salt, e_im)
        Fp = chain.poly_spectrum(chain.chunk_matrix(ext, P))
        return st, Fp

    tm("xla_chunks_fft", step_xla)

    for G in sorted({1, 5, g_auto, 25}):
        if P % G:
            continue

        def step_pl(st, salt, G=G):
            o_re, o_im = chunk_poly(
                e_re + salt, e_im, valid=V, ratio=R, nif=nif,
                n_chunks=P, group=G)
            return st, jnp.fft.fft(jax.lax.complex(o_re, o_im))

        tm(f"pallas_G{G}_fft", step_pl)


if __name__ == "__main__":
    main()
