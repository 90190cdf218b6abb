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


def _kernel(nif, a_re, a_im, b_re, b_im, o_re, o_im):
    # a = rows3[p] (Vr, R), b = rows3[p+1] (Vr, R); chunk rows = first
    # nif of [a; b]; output tile = their transpose (R, nif)
    win_re = jnp.concatenate([a_re[:], b_re[:]], axis=0)[:nif]
    win_im = jnp.concatenate([a_im[:], b_im[:]], axis=0)[:nif]
    o_re[:] = win_re.T
    o_im[:] = win_im.T


@functools.partial(jax.jit, static_argnames=("valid", "ratio", "nif", "n_chunks", "interpret"))
def chunk_poly(ext_re, ext_im, *, valid: int, ratio: int, nif: int,
               n_chunks: int, interpret: bool = False):
    """ext planes (L,) -> ct planes (P, R, nif), ct[p,s,q]=ext[pV+qR+s]."""
    P, R = int(n_chunks), int(ratio)
    vr = valid // R
    assert nif <= 2 * vr, (nif, vr)
    rows_needed = (P + 1) * vr  # block p uses rows3[p] and rows3[p+1]
    pad = rows_needed * R - ext_re.shape[-1]
    assert pad >= 0
    rows3_re = jnp.pad(ext_re, (0, pad)).reshape(P + 1, vr, R)
    rows3_im = jnp.pad(ext_im, (0, pad)).reshape(P + 1, vr, R)

    blk_in = pl.BlockSpec((1, vr, R), lambda p, a=0: (p, 0, 0))
    blk_in2 = pl.BlockSpec((1, vr, R), lambda p: (p + 1, 0, 0))
    blk_out = pl.BlockSpec((1, R, nif), lambda p: (p, 0, 0))

    def kern(a_re, a_im, b_re, b_im, o_re, o_im):
        win_re = jnp.concatenate([a_re[0], b_re[0]], axis=0)[:nif]
        win_im = jnp.concatenate([a_im[0], b_im[0]], axis=0)[:nif]
        o_re[0] = win_re.T
        o_im[0] = win_im.T

    out_shape = [jax.ShapeDtypeStruct((P, R, nif), jnp.float32)] * 2
    o_re, o_im = pl.pallas_call(
        kern,
        grid=(P,),
        in_specs=[blk_in, blk_in, blk_in2, blk_in2],
        out_specs=[blk_out, blk_out],
        out_shape=out_shape,
        interpret=interpret,
    )(rows3_re, rows3_im, rows3_re, rows3_im)
    return o_re, o_im
