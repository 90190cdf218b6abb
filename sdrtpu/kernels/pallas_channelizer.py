"""Pallas TPU kernel: fused multi-channel mix + decimate (the hot kernel).

The wideband channelizer front end (mix each VFO to baseband, then
decimate) dominates the receive pipeline.  In plain XLA each FIR tap
re-reads the whole mixed array from HBM (~36 passes for the first stage),
pinning the chain at the memory roofline.  This kernel fuses per tile in
VMEM:

    ext tile (65 x 1024 f32 re/im)            <- one HBM read
    rot = coarse_seg (x) fine   (outer product; no transcendentals)
    mixed = ext * rot           (complex multiply, VPU)
    y = mixed[0:64] @ W1 + mixed[1:65, :32] @ W2   (MXU)
    out tile (64 x (1024/M))                   <- one HBM write

The decimating FIR is expressed as a banded Toeplitz matrix ``W1``
(1024 x 1024/M) whose column c holds taps h[t] at rows M*c + t, plus a
small spill matrix ``W2`` for windows crossing the 1024-sample row
boundary — turning the whole filter into one MXU matmul per tile.

Layout notes:
- complex never touches the kernel: all buffers are planar f32 pairs
  (Mosaic has no complex support; planar is the faster layout anyway).
- rows of 1024 samples make the rotation outer product line up with the
  (sublane x lane) tiling and the coarse/fine phase tables
  (``kernels/mixer.py`` precision scheme: float64 host tables).
- grid = (time tiles, channels); each instance handles one channel-tile.

Constraints: decimation M must divide 1024 with 1024/M a lane multiple
(M in {2, 4, 8}), tap count T <= 1024; block length a multiple of the
65536-sample tile.  `fused_channelize_decimate` falls back to the XLA path
when unavailable (non-TPU backends use interpret mode in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW = 1024
TILE_ROWS = 64          # 64 rows x 1024 = 65536 input samples per tile
TILE_IN = TILE_ROWS * ROW


def _toeplitz_mats(taps: np.ndarray, M: int) -> tuple[np.ndarray, np.ndarray]:
    """W1 (1024, 1024//M) and spill W2 (32, 1024//M) for decim-by-M."""
    T = len(taps)
    cols = ROW // M
    W1 = np.zeros((ROW, cols), np.float32)
    W2 = np.zeros((32, cols), np.float32)
    for c in range(cols):
        for t in range(T):
            j = M * c + t
            if j < ROW:
                W1[j, c] = taps[t]
            else:
                j2 = j - ROW
                assert j2 < 32, "tap spill exceeds one 32-row pad"
                W2[j2, c] = taps[t]
    return W1, W2


def _kernel(coarse_re, coarse_im, main_re, main_im, extra_re, extra_im,
            fine_re, fine_im, w1, w2, out_re, out_im):
    c = pl.program_id(1)
    # coarse blocks arrive as (1, C, 128); select this channel's row
    cr = coarse_re[0, c, :TILE_ROWS + 1][:, None]       # (65, 1)
    ci = coarse_im[0, c, :TILE_ROWS + 1][:, None]
    fr = fine_re[c][None, :]                             # (1, 1024)
    fi = fine_im[c][None, :]
    rot_re = cr * fr - ci * fi                           # (65, 1024)
    rot_im = cr * fi + ci * fr

    # extra block is 8 rows; only its first row is the halo row
    ext_re = jnp.concatenate([main_re[:], extra_re[0:1]], axis=0)  # (65, 1024)
    ext_im = jnp.concatenate([main_im[:], extra_im[0:1]], axis=0)

    mr = ext_re * rot_re - ext_im * rot_im
    mi = ext_re * rot_im + ext_im * rot_re

    y_re = jnp.dot(mr[:TILE_ROWS], w1[:], preferred_element_type=jnp.float32)
    y_re += jnp.dot(mr[1:, :32], w2[:], preferred_element_type=jnp.float32)
    y_im = jnp.dot(mi[:TILE_ROWS], w1[:], preferred_element_type=jnp.float32)
    y_im += jnp.dot(mi[1:, :32], w2[:], preferred_element_type=jnp.float32)

    out_re[:] = y_re[None]
    out_im[:] = y_im[None]


@functools.partial(
    jax.jit,
    static_argnames=("n", "n_channels", "decim", "interpret"),
)
def _run(ext_re, ext_im, coarse_tiles_re, coarse_tiles_im, fine_re, fine_im,
         w1, w2, n, n_channels, decim, interpret):
    n_tiles = n // TILE_IN
    cols = ROW // decim
    C = n_channels

    grid = (n_tiles, C)
    out_shape = [
        jax.ShapeDtypeStruct((C, n_tiles * TILE_ROWS, cols), jnp.float32),
        jax.ShapeDtypeStruct((C, n_tiles * TILE_ROWS, cols), jnp.float32),
    ]
    rows_specs = [
        pl.BlockSpec((1, C, 128), lambda i, c: (i, 0, 0),
                     memory_space=pltpu.VMEM),  # coarse tiles (re)
        pl.BlockSpec((1, C, 128), lambda i, c: (i, 0, 0),
                     memory_space=pltpu.VMEM),  # coarse tiles (im)
        pl.BlockSpec((TILE_ROWS, ROW), lambda i, c: (i, 0),
                     memory_space=pltpu.VMEM),  # main rows
        pl.BlockSpec((TILE_ROWS, ROW), lambda i, c: (i, 0),
                     memory_space=pltpu.VMEM),
        # Mosaic wants sublane-dim multiples of 8: read an 8-row block
        # starting at the next tile's first row; kernel uses row 0 only.
        pl.BlockSpec((8, ROW), lambda i, c: (8 * (i + 1), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, ROW), lambda i, c: (8 * (i + 1), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((C, ROW), lambda i, c: (0, 0),
                     memory_space=pltpu.VMEM),  # fine (re)
        pl.BlockSpec((C, ROW), lambda i, c: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ROW, cols), lambda i, c: (0, 0),
                     memory_space=pltpu.VMEM),  # W1
        pl.BlockSpec((32, cols), lambda i, c: (0, 0),
                     memory_space=pltpu.VMEM),  # W2
    ]
    out_specs = [
        pl.BlockSpec((1, TILE_ROWS, cols), lambda i, c: (c, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE_ROWS, cols), lambda i, c: (c, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    rows = ext_re.shape[0]
    y_re, y_im = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=rows_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(coarse_tiles_re, coarse_tiles_im, ext_re, ext_im, ext_re, ext_im,
      fine_re, fine_im, w1, w2)
    n_out = n // decim
    return (
        y_re.reshape(C, n_tiles * TILE_ROWS * cols)[:, :n_out],
        y_im.reshape(C, n_tiles * TILE_ROWS * cols)[:, :n_out],
    )


class FusedChannelizerStage:
    """Host-side wrapper: plan tables + invoke the fused kernel.

    Computes, for each channel c:  y_c = decimate_M(x * exp(i*w_c*t), taps)
    with streaming tail/phase state like the unfused ops.
    """

    def __init__(self, offsets_hz, samplerate: float, taps: np.ndarray,
                 decim: int, block_len: int, interpret: bool = False):
        assert decim in (2, 4, 8) and ROW % decim == 0
        assert block_len % decim == 0
        self.offsets = np.asarray(offsets_hz, np.float64)
        self.C = len(self.offsets)
        self.fs = float(samplerate)
        self.taps = np.asarray(taps, np.float32)
        self.T = len(self.taps)
        # spill matrix covers 32 rows past the 1024-boundary
        assert self.T <= int(decim) + 32, (
            f"{self.T} taps exceed the kernel's spill budget for M={decim}"
        )
        self.decim = int(decim)
        self.n = int(block_len)
        self.interpret = interpret

        # offsets are channel *centers*: rotate by -center to bring each
        # channel to baseband (RxVFO convention)
        self.omega = -2.0 * np.pi * self.offsets / self.fs  # (C,) float64
        w1, w2 = _toeplitz_mats(self.taps, self.decim)
        self.w1, self.w2 = w1, w2
        # fine table: exp(i w r), r in [0, 1024)
        r = np.arange(ROW, dtype=np.float64)
        ang_f = np.mod(self.omega[:, None] * r, 2 * np.pi)
        self.fine_re = np.cos(ang_f).astype(np.float32)
        self.fine_im = np.sin(ang_f).astype(np.float32)

        # halo length: T-1 rounded into the one extra row we read
        self.halo = self.T - 1
        assert self.halo < ROW

        # ext covers n + halo, zero-padded up to whole 65536-sample tiles
        # plus 8 extra rows (the halo row is read as part of an 8-row
        # aligned block); outputs beyond n//decim are truncated.
        self.n_tiles = -(-self.n // TILE_IN)
        self.n_padded = self.n_tiles * TILE_IN
        self.ext_rows = self.n_tiles * TILE_ROWS + 8

        # coarse tiles: ext position offset per (tile, row-in-tile):
        # ext row g (global) covers samples [g*1024, ...); its absolute
        # *signal* index is g*1024 - halo + sample_pos... we instead fold
        # the -halo shift and the streaming phase into the coarse table at
        # call time (cheap: (C, rows) cos/sin on host per reconfigure, and
        # a per-block phase rotation on device).
        g = np.arange(self.n_tiles * TILE_ROWS + 1, dtype=np.float64)
        ang_c = np.mod(self.omega[:, None] * (g * ROW - self.halo), 2 * np.pi)
        cr = np.cos(ang_c)
        cim = np.sin(ang_c)
        # tile view: (n_tiles, C, 65) padded to 128 lanes
        ct_re = np.zeros((self.n_tiles, self.C, 128), np.float32)
        ct_im = np.zeros((self.n_tiles, self.C, 128), np.float32)
        for i in range(self.n_tiles):
            seg = slice(i * TILE_ROWS, i * TILE_ROWS + TILE_ROWS + 1)
            ct_re[i, :, : TILE_ROWS + 1] = cr[:, seg]
            ct_im[i, :, : TILE_ROWS + 1] = cim[:, seg]
        self.coarse_re = ct_re
        self.coarse_im = ct_im
        # per-block phase advance: omega * n mod 2pi
        self.block_delta = np.mod(self.omega * self.n, 2 * np.pi).astype(
            np.float32
        )

    def init_state(self):
        return {
            "tail": np.zeros(self.halo, np.complex64),
            "phase": np.zeros(self.C, np.float32),
        }

    def out_len(self, n: int) -> int:
        assert n == self.n
        return n // self.decim

    def __call__(self, state, x):
        n = x.shape[-1]
        assert n == self.n
        ext = jnp.concatenate([jnp.asarray(state["tail"]), x])
        pad = self.ext_rows * ROW - ext.shape[-1]
        ext = jnp.pad(ext, (0, pad))  # zero tail pad; outputs truncated below
        ext_re = ext.real.reshape(self.ext_rows, ROW)
        ext_im = ext.imag.reshape(self.ext_rows, ROW)

        # rotate the coarse tables by the carried per-channel phase
        ph = jnp.asarray(state["phase"])  # (C,)
        pr, pi = jnp.cos(ph), jnp.sin(ph)
        cr = jnp.asarray(self.coarse_re)
        ci = jnp.asarray(self.coarse_im)
        ctr = cr * pr[None, :, None] - ci * pi[None, :, None]
        cti = cr * pi[None, :, None] + ci * pr[None, :, None]

        y_re, y_im = _run(
            ext_re, ext_im, ctr, cti,
            jnp.asarray(self.fine_re), jnp.asarray(self.fine_im),
            jnp.asarray(self.w1), jnp.asarray(self.w2),
            self.n_padded, self.C, self.decim, self.interpret,
        )
        n_out = self.n // self.decim
        y_re = y_re[:, :n_out]
        y_im = y_im[:, :n_out]
        new_state = {
            # x[-0:] would be the WHOLE block; single-tap filters carry
            # an empty tail
            "tail": x[-self.halo:] if self.halo else x[:0],
            "phase": jnp.mod(
                ph + jnp.asarray(self.block_delta), np.float32(2 * np.pi)
            ),
        }
        return new_state, jax.lax.complex(y_re, y_im)
