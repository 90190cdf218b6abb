"""Round-5: closing the small-R (8-VFO) chunk-build gap (VERDICT r4 #7).

The R=40 plan's (nif, R) -> (R, nif) polyphase layout loses: lane-40
tiles waste ~70% of every 128-lane vector (pallas G=5 measured 0.372
ms/window vs XLA 0.285 vs a ~0.11 two-pass-copy floor).  This measures:

  - fft_only: length-nif FFT on a pre-built (P, R, nif) tile — the
    irreducible compute after any build.
  - floor_copy+fft: a contiguous same-bytes copy (P, F reshaped to
    (P, R, nif) WITHOUT the transpose semantics) + FFT — the layout
    floor (wrong math, right traffic).
  - xla / pallas-G (round-4c variants, re-measured same-day).
  - pallas_lanesfull: NEW kernel — loads the contiguous window as
    (rows, 128) (full lanes, zero HBM-side waste), does the
    (nif, R)->(R, nif) permutation as an in-VMEM reshape+transpose
    relayout.  Tests whether Mosaic's relayout beats the lane-40 loads.

Usage: python exp/chunks8c.py
Scratch instrumentation; not shipped.
"""

import functools
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jax.experimental import pallas as pl

from sdrtpu.roofline import slope_time
from sdrtpu.apps.wbfm_pipeline import WbfmMultiVfoPipeline
from sdrtpu.kernels.pallas_chunks import choose_group, chunk_poly


def log(*a):
    print(*a, flush=True)


@functools.partial(jax.jit, static_argnames=(
    "valid", "ratio", "nif", "n_chunks", "group", "interpret"))
def chunk_poly_lanesfull(ext_re, ext_im, *, valid, ratio, nif, n_chunks,
                         group=4, interpret=False):
    """Lanes-full load variant: window blocks shaped (*, 128)."""
    P, R, G = int(n_chunks), int(ratio), int(group)
    vr = valid // R
    assert nif <= 2 * vr
    assert P % G == 0
    assert (G * vr * R) % 128 == 0, (G, vr, R)
    nblk = P // G
    rows128 = G * vr * R // 128
    need = (nblk + 1) * G * vr * R - ext_re.shape[-1]
    assert need >= 0
    r3_re = jnp.pad(ext_re, (0, need)).reshape(nblk + 1, rows128, 128)
    r3_im = jnp.pad(ext_im, (0, need)).reshape(nblk + 1, rows128, 128)

    blk_in = pl.BlockSpec((1, rows128, 128), lambda g: (g, 0, 0))
    blk_in2 = pl.BlockSpec((1, rows128, 128), lambda g: (g + 1, 0, 0))
    blk_out = pl.BlockSpec((G, R, nif), lambda g: (g, 0, 0))

    def kern(a_re, a_im, b_re, b_im, o_re, o_im):
        # 2*G*vr*R contiguous elements, lanes full on load
        win_re = jnp.concatenate([a_re[0], b_re[0]], axis=0).reshape(-1)
        win_im = jnp.concatenate([a_im[0], b_im[0]], axis=0).reshape(-1)
        wr = win_re.reshape(2 * G * vr, R)
        wi = win_im.reshape(2 * G * vr, R)
        for j in range(G):
            o_re[j] = wr[j * vr:j * vr + nif].T
            o_im[j] = wi[j * vr:j * vr + nif].T

    out_shape = [jax.ShapeDtypeStruct((P, R, nif), jnp.float32)] * 2
    return pl.pallas_call(
        kern, grid=(nblk,),
        in_specs=[blk_in, blk_in, blk_in2, blk_in2],
        out_specs=[blk_out, blk_out], out_shape=out_shape,
        interpret=interpret,
    )(r3_re, r3_im, r3_re, r3_im)


def main():
    fs_in, n_vfo = 10e6, 8
    m = WbfmMultiVfoPipeline.block_multiple(fs_in)
    block_len = (max(500_000, int(fs_in / 20)) // m) * m
    offsets = np.linspace(-0.4 * fs_in, 0.4 * fs_in, n_vfo)
    pipe = WbfmMultiVfoPipeline(offsets, fs_in, block_len, spectrum=True)
    chain = pipe.channelizer.fused
    sub = pipe._subk(256)
    n = block_len * sub
    P = sub * chain.n_chunks
    V, R, nif = chain.valid, chain.ratio, chain.nif
    vr = V // R
    g_auto = choose_group(chain.n_chunks, V, R, nif)
    log(f"block={block_len} sub={sub} P={P} valid={V} R={R} nif={nif} "
        f"vr={vr} G_auto={g_auto}")

    rng = np.random.default_rng(0)
    ext_len = chain.tpad - 1 + n
    e = (rng.standard_normal(ext_len)
         + 1j * rng.standard_normal(ext_len)).astype(np.complex64)
    e_re = jax.device_put(e.real.astype(np.float32))
    e_im = jax.device_put(e.imag.astype(np.float32))
    # pre-built tile for the fft_only baseline
    tile = jax.device_put(
        rng.standard_normal((P, R, nif)).astype(np.float32))
    tile_i = jax.device_put(
        rng.standard_normal((P, R, nif)).astype(np.float32))

    def tm(name, step):
        t = slope_time(step, jnp.float32(0))
        log(f"  {name:28s} {t*1e3:8.4f} ms/window ({t*1e3/sub:.4f} ms/block)")
        return t

    def step_fft_only(st, salt):
        return st, jnp.fft.fft(jax.lax.complex(tile + salt, tile_i))

    t_fft = tm("fft_only(P,R,nif)", step_fft_only)

    # floor: contiguous same-bytes build (wrong math, right traffic):
    # window copy (P, F) then a free reshape — no transpose
    def step_floor(st, salt):
        ext = jax.lax.complex(e_re + salt, e_im)
        cm = chain.chunk_matrix(ext, P)          # (P, F) contiguous rows
        return st, jnp.fft.fft(cm.reshape(P, R, nif))

    t_floor = tm("floor_contig_copy+fft", step_floor)

    def step_xla(st, salt):
        ext = jax.lax.complex(e_re + salt, e_im)
        return st, chain.poly_spectrum(chain.chunk_matrix(ext, P))

    t_xla = tm("xla_chunks_fft", step_xla)

    for G in sorted({g_auto, 5}):
        if P % G:
            continue

        def step_pl(st, salt, G=G):
            o_re, o_im = chunk_poly(
                e_re + salt, e_im, valid=V, ratio=R, nif=nif,
                n_chunks=P, group=G)
            return st, jnp.fft.fft(jax.lax.complex(o_re, o_im))

        tm(f"pallas_G{G}_fft", step_pl)

    for G in (4, 8, 20):
        if P % G or (G * vr * R) % 128:
            continue

        def step_lf(st, salt, G=G):
            o_re, o_im = chunk_poly_lanesfull(
                e_re + salt, e_im, valid=V, ratio=R, nif=nif,
                n_chunks=P, group=G)
            return st, jnp.fft.fft(jax.lax.complex(o_re, o_im))

        try:
            tm(f"pallas_lanesfull_G{G}_fft", step_lf)
        except Exception as ex:  # noqa: BLE001 — exploratory kernel
            log(f"  pallas_lanesfull_G{G}: {type(ex).__name__}: "
                f"{str(ex)[:200]}")

    log(f"summary: fft_only {t_fft*1e3:.3f}; build floor "
        f"{(t_floor-t_fft)*1e3:.3f}; xla build {(t_xla-t_fft)*1e3:.3f}")


if __name__ == "__main__":
    main()
