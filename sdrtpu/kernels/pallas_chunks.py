"""Pallas TPU kernel: one-pass overlap-save chunk builder.

The FFT channelizer's forward path needs the chunk polyphase layout

    ct[p, s, q] = ext[p*valid + q*R + s],   s in [0, R), q in [0, nif)

(`FftDecimatorChain.poly_spectrum` input).  In XLA this is built as a
chunk-matrix concat (one materialization) followed by a reshape +
transpose the FFT's input copy absorbs — measured ~0.07-0.13 ms/block at
the 64-VFO plan, the channelizer's largest remaining data-movement term
(docs/PERF.md round 4; the XLA alternatives in exp/round4b.py all tie).
Here each grid step reads the two Vr-row blocks covering chunk p from
HBM once, transposes in VMEM, and writes the (R, nif) tile — one read +
one write total.

With rows2 = ext_padded.reshape(-1, R) and Vr = valid//R:

    ct[p, s, q] = rows2[p*Vr + q, s]
    ct[p] = rows2[p*Vr : p*Vr + nif, :].T

Overlapping windows (stride Vr < height nif) cannot be expressed as a
single BlockSpec, so the kernel takes ceil(nif/Vr)+1 consecutive row
blocks (index maps p -> p+a, the halo-row pattern of
`pallas_channelizer`).  Constraint: nif <= 2*Vr (one extra block), which
holds for every plan `_plan_fft_chunks` emits at its defaults (nfft
tight against valid + t_eq - 1 implies valid >= R*nif/ (overlap factor)
> R*nif/2).  Callers must check `chunk_poly_supported` first.

Grouping (round 4c, VERDICT-r3 headroom item): at small-R plans (8-VFO,
R=40, nif=128) the per-chunk tile is only 5120 elements and a
1000-step grid loses to XLA (measured 5476 -> 3919 Msps end to end).
``group=G`` emits G chunks per grid step — the two input blocks become
(G*Vr, R) and the output tile (G, R, nif) — so the tile size is
G*R*nif and the grid shrinks G-fold.  Chunk j of a group needs window
rows [j*Vr, j*Vr + nif) relative to its block start; the furthest row
is (G-1)*Vr + nif <= 2*G*Vr whenever nif <= 2*Vr, so the same support
condition covers every G >= 1.  `choose_group` picks G per plan.

Measured at the 8-VFO plan (R=40, P=1000, exp/chunks8.py round 4c):
G=1 0.553, G=5 0.376, G=25 0.372 ms/window vs XLA 0.285 — grouping
removes the grid overhead (G=5 == G=25) but the kernel still loses
~30%: with R=40 in the lane (minor) dimension every input tile wastes
~70% of each 128-lane vector, a layout cost grouping cannot fix.  The
auto gate therefore stays R >= 128 (64-VFO-class plans, where the
kernel wins 4719 -> 5186 Msps); grouped mode remains available for
forced-on use and for future plans with R in [64, 128).

Planar f32 throughout (Mosaic has no complex); both planes ride one
kernel launch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl


def chunk_poly_supported(valid: int, ratio: int, nif: int) -> bool:
    """True if the plan fits the kernel's two-block window constraint."""
    if valid % ratio:
        return False
    vr = valid // ratio
    return nif <= 2 * vr


# Tile-size targets for `choose_group` (elements per output tile / per
# input window plane), from the round-4 measurements: the 64-VFO
# (R=200, nif=128, 25600-element) tile amortizes the grid fine, while
# the 8-VFO 5120-element tile at G=1 loses.
_TILE_TARGET = 20_000
_WINDOW_MAX = 300_000


def choose_group(n_chunks_per_block: int, valid: int, ratio: int,
                 nif: int) -> int:
    """Pick chunks-per-grid-step: smallest divisor of the PER-BLOCK chunk
    count whose output tile reaches ``_TILE_TARGET`` elements (so any
    runtime multiple P = K*n_chunks stays divisible), capped by the VMEM
    window bound.  If no divisor reaches the target, returns the LARGEST
    divisor that fits the window bound (a bigger G still shrinks the
    grid); 1 only when nothing larger fits."""
    vr = valid // ratio
    best = 1
    for g in range(1, n_chunks_per_block + 1):
        if n_chunks_per_block % g:
            continue
        if 2 * g * vr * ratio > _WINDOW_MAX:
            break
        best = g
        if g * ratio * nif >= _TILE_TARGET:
            break
    return best


@functools.partial(jax.jit, static_argnames=(
    "valid", "ratio", "nif", "n_chunks", "group", "interpret"))
def chunk_poly(ext_re, ext_im, *, valid: int, ratio: int, nif: int,
               n_chunks: int, group: int = 1, interpret: bool = False):
    """ext planes (L,) -> ct planes (P, R, nif), ct[p,s,q]=ext[pV+qR+s]."""
    P, R, G = int(n_chunks), int(ratio), int(group)
    vr = valid // R
    assert nif <= 2 * vr, (nif, vr)
    assert P % G == 0, (P, G)
    nblk = P // G
    # grid step g covers chunks [g*G, (g+1)*G); chunk j of the group
    # reads window rows [j*vr, j*vr + nif) past the block start, so the
    # halo block g+1 suffices: (G-1)*vr + nif <= 2*G*vr given nif<=2*vr
    rows_needed = (nblk + 1) * G * vr
    pad = rows_needed * R - ext_re.shape[-1]
    assert pad >= 0
    rows3_re = jnp.pad(ext_re, (0, pad)).reshape(nblk + 1, G * vr, R)
    rows3_im = jnp.pad(ext_im, (0, pad)).reshape(nblk + 1, G * vr, R)

    blk_in = pl.BlockSpec((1, G * vr, R), lambda g: (g, 0, 0))
    blk_in2 = pl.BlockSpec((1, G * vr, R), lambda g: (g + 1, 0, 0))
    blk_out = pl.BlockSpec((G, R, nif), lambda g: (g, 0, 0))

    def kern(a_re, a_im, b_re, b_im, o_re, o_im):
        win_re = jnp.concatenate([a_re[0], b_re[0]], axis=0)
        win_im = jnp.concatenate([a_im[0], b_im[0]], axis=0)
        for j in range(G):
            o_re[j] = win_re[j * vr : j * vr + nif].T
            o_im[j] = win_im[j * vr : j * vr + nif].T

    out_shape = [jax.ShapeDtypeStruct((P, R, nif), jnp.float32)] * 2
    o_re, o_im = pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[blk_in, blk_in, blk_in2, blk_in2],
        out_specs=[blk_out, blk_out],
        out_shape=out_shape,
        interpret=interpret,
    )(rows3_re, rows3_im, rows3_re, rows3_im)
    return o_re, o_im
