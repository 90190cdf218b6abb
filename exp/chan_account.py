"""Round-5 (VERDICT r4 #2): measured-bytes account of the channelizer.

Measures each channelizer substage with slope probes and compares
against its EXACT algorithmic traffic (no modeled unfused
intermediates): is the remaining time irreducible data movement, and
how far is each substage from the measured streaming ceiling?

Substages (per steady-state window of `sub` blocks):
  build    ext -> (P, R, nif) polyphase tile  (exact: ext read + tile write)
  fft      length-nif FFT batch               (exact: tile read + X write)
  fold     alias-fold einsum                  (exact: X + table + folded)
  ifft+rot (C, P, nif) ifft + residual rotator + slice/reshape
  TOTAL    the fused channelizer as one step

Usage: python exp/chan_account.py [--fs 50e6 --nvfo 64]
Scratch instrumentation backing docs/PERF.md round 5; not shipped.
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

from sdrtpu.roofline import slope_time, measure_hbm_peak
from sdrtpu.apps.wbfm_pipeline import WbfmMultiVfoPipeline


def log(*a):
    print(*a, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fs", type=float, default=50e6)
    ap.add_argument("--nvfo", type=int, default=64)
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
    V, R, nif, F = chain.valid, chain.ratio, chain.nif, chain.nfft
    C = chain.n_channels
    c64 = 8.0
    log(f"config: {n_vfo} VFOs @ {fs_in/1e6:.0f} Msps, block={block_len}, "
        f"sub={sub}, P={P}, R={R}, nif={nif}, F={F}, "
        f"pallas={chain._pallas_chunks}")

    bw = measure_hbm_peak() * 1e9  # B/s
    log(f"measured streaming ceiling: {bw/1e9:.1f} GB/s")

    rng = np.random.default_rng(0)
    ext_len = chain.tpad - 1 + n
    e = (rng.standard_normal(ext_len)
         + 1j * rng.standard_normal(ext_len)).astype(np.complex64)
    e_re = jax.device_put(e.real.astype(np.float32))
    e_im = jax.device_put(e.imag.astype(np.float32))
    tile_r = jax.device_put(rng.standard_normal((P, R, nif)).astype(np.float32))
    tile_i = jax.device_put(rng.standard_normal((P, R, nif)).astype(np.float32))
    hf = np.asarray(chain.init_state()["hf"])  # HOST numpy: complex device arrays cannot lower as constants on axon
    fold_r = jax.device_put(rng.standard_normal((C, P, nif)).astype(np.float32))
    fold_i = jax.device_put(rng.standard_normal((C, P, nif)).astype(np.float32))

    rows = []

    def tm(name, step, exact_bytes):
        t = slope_time(step, jnp.float32(0))
        eff = exact_bytes / t / bw
        rows.append((name, t, exact_bytes, eff))
        log(f"  {name:12s} {t*1e3:8.4f} ms/win  exact {exact_bytes/1e6:7.1f} MB"
            f"  -> {exact_bytes/t/1e9:6.1f} GB/s = {eff:6.1%} of ceiling")
        return t

    # build: ext read + tile write (pallas path re-reads ext as halo: 2x)
    ext_reads = 2 if chain._pallas_chunks else 1
    b_build = (ext_reads * ext_len + P * R * nif) * c64

    if chain._pallas_chunks:
        from sdrtpu.kernels.pallas_chunks import chunk_poly

        def step_build(st, salt):
            o_re, o_im = chunk_poly(
                e_re + salt, e_im, valid=V, ratio=R, nif=nif, n_chunks=P,
                group=chain._pallas_group)
            return st, (o_re, o_im)
    else:

        def step_build(st, salt):
            ext = jax.lax.complex(e_re + salt, e_im)
            cm = chain.chunk_matrix(ext, P)
            cp = cm.reshape(P, nif, R)
            return st, jnp.swapaxes(cp, -1, -2)

    t_build = tm("build", step_build, b_build)

    def step_fft(st, salt):
        return st, jnp.fft.fft(jax.lax.complex(tile_r + salt, tile_i))

    t_fft = tm("fft", step_fft, 2 * P * R * nif * c64)

    def step_fold(st, salt):
        X = jax.lax.complex(tile_r + salt, tile_i)
        return st, jnp.einsum("psk,csk->cpk", X, hf)

    t_fold = tm("fold", step_fold,
                (P * F + C * R * nif + C * P * nif) * c64)

    def step_ifft_rot(st, salt):
        S = jax.lax.complex(fold_r + salt, fold_i)
        y = jnp.fft.ifft(S)
        m0 = (chain.tpad - 1) // R
        y = y[:, :, m0:m0 + V // R].reshape(C, n // R)
        st_rot, y = chain.rot.rotate_blocks(
            chain.init_state()["rot"], y, sub)
        return st, y

    b_ifft = (2 * C * P * nif + 2 * C * (n // R)) * c64
    t_ifft = tm("ifft+rot", step_ifft_rot, b_ifft)

    # the whole fused channelizer step, same window
    st0 = chain.init_state()

    def step_total(st, salt):
        _, y = chain(st0, jax.lax.complex(e_re[:n] + salt, e_im[:n]))
        return st, y

    b_total = b_build + 2 * P * R * nif * c64 \
        + (P * F + C * R * nif + C * P * nif) * c64 + b_ifft
    t_total = tm("TOTAL(fused)", step_total, b_total)

    t_sum = t_build + t_fft + t_fold + t_ifft
    log(f"sum of substages {t_sum*1e3:.4f} ms vs fused {t_total*1e3:.4f} "
        f"(fusion gain {1 - t_total/max(t_sum,1e-12):+.1%})")
    log(f"algorithmic floor at ceiling: {b_total/bw*1e3:.4f} ms -> fused "
        f"runs at {b_total/t_total/bw:.1%} of the measured streaming "
        f"ceiling on its exact bytes")


if __name__ == "__main__":
    main()
