"""Round-4c experiment: demod/audio substage timing at the 64-VFO shapes.

BENCH64_r04 has wfm_demod at 0.1075 ms/block (36% HBM util) and
audio_resamp_deemph at 0.0757 ms (16%) — together ~38% of the pipeline.
This breaks them into substages (quadrature atan2, pilot FFT FIR,
envelope normalize, stereo decode; audio frame build, polyphase matmul,
deemphasis) and times candidate replacements side by side:

  - pilot FIR at alternate overlap-save nfft (single 16384 vs chunked)
  - audio polyphase as a sum of R shifted matmuls (no frame concat)

Usage: python exp/demod64.py [--fs 50e6 --nvfo 64]
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
from sdrtpu.kernels.fir import _fft_corr_padded


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
    K = pipe._subk(256)
    n_if = pipe.channelizer.out_len(block_len)
    C = pipe.n_channels
    log(f"block_len={block_len} C={C} n_if={n_if} K={K}")

    rng = np.random.default_rng(0)
    x = (rng.standard_normal(block_len) + 1j * rng.standard_normal(block_len)).astype(np.complex64) * 0.05
    re = jax.device_put(x.real.astype(np.float32))
    im = jax.device_put(x.imag.astype(np.float32))

    demod = pipe.demod

    @jax.jit
    def _gen(re_, im_, chan_r, demod_r):
        _, y = pipe.channelizer(complexify(chan_r), jax.lax.complex(re_, im_))
        y = jnp.tile(y, (1, K))
        st = complexify(demod_r)
        stq, mpx = demod.quad(st["quad"], y)
        stp, r = demod.pilot_fir(st["pilot_fir"], mpx)
        _, (stereo, _) = demod(st, y)
        return jnp.real(y), jnp.imag(y), mpx, r, stereo

    y_re, y_im, m0, r0, stereo0 = _gen(
        re, im,
        realify(pipe.channelizer.init_state()),
        realify(pipe.demod.init_state()),
    )

    results = {}

    def tm(name, step, state0, per_block=K):
        state0 = jax.jit(
            lambda rs: realify(step(complexify(rs), jnp.float32(0))[0])
        )(state0)
        t = slope_time(step, state0) / per_block
        results[name] = t * 1e3
        log(f"  {name:32s} {t*1e3:8.4f} ms/block")
        return t

    # --- demod substages --------------------------------------------------
    def step_quad(st, salt):
        s, mpx = demod.quad(st, jax.lax.complex(y_re + salt, y_im))
        return s, mpx

    tm("quad_atan2", step_quad, realify(np.ones((), np.complex64)))

    def step_pilot(st, salt):
        s, r = demod.pilot_fir(st, m0 + salt)
        return s, r

    tm("pilot_fir_16384", step_pilot, demod.pilot_fir.init_state())

    # pilot FIR at forced smaller overlap-save nfft (chunked)
    taps = demod.pilot_fir.taps
    T = len(taps)

    def chunked_pilot(ext, nfft):
        # mirror fft_correlate_valid's chunk path with a forced nfft
        L = ext.shape[-1]
        span = L - T + 1
        valid = nfft - T + 1
        P = -(-span // valid)
        Q = -(-nfft // valid)
        rows_n = P + Q - 1
        lead = ext.shape[:-1]
        pad = [(0, 0)] * (ext.ndim - 1) + [(0, rows_n * valid - L)]
        rows = jnp.pad(ext, pad).reshape(lead + (rows_n, valid))
        chunks = jnp.concatenate(
            [jax.lax.dynamic_slice_in_dim(rows, q, P, axis=-2)
             for q in range(Q)], axis=-1)[..., :nfft]
        yv = _fft_corr_padded(chunks, taps, nfft)
        return yv.reshape(lead + (P * valid,))[..., :span]

    tail = np.zeros((T - 1,), np.float32)
    for nfft in (2048, 4096, 8192):
        def step_pc(st, salt, nfft=nfft):
            ext = jnp.concatenate(
                [jnp.broadcast_to(st, m0.shape[:-1] + (T - 1,)), m0 + salt],
                axis=-1)
            return st, chunked_pilot(ext, nfft)

        tm(f"pilot_fir_chunk{nfft}", step_pc, jnp.zeros((T - 1,), jnp.float32))

    # pilot FIR as banded-Toeplitz matmuls
    from sdrtpu.kernels.fir import matmul_correlate_valid

    def step_pm(st, salt):
        ext = jnp.concatenate(
            [jnp.broadcast_to(st, m0.shape[:-1] + (T - 1,)), m0 + salt],
            axis=-1)
        return st, matmul_correlate_valid(ext, taps)

    tm("pilot_fir_mm", step_pm, jnp.zeros((T - 1,), jnp.float32))

    # envelope normalize alone
    seg = max(1, round(0.01 * demod.samplerate))

    def step_env(st, salt):
        from sdrtpu.kernels.wfm import _segment_mean
        r2 = (r0 + salt) ** 2
        c2 = r2 / jnp.maximum(_segment_mean(r2, seg), 1e-12) - 1.0
        return st, c2

    tm("envelope_norm", step_env, jnp.float32(0))

    # stereo decode (delay + lmr + stack)
    def step_decode(st, salt):
        s, lpr = demod.lpr_delay(st, m0 + salt)
        lmr = 2.0 * lpr * r0
        out = jnp.stack([lpr + lmr, lpr - lmr])
        return s, out

    tm("decode_delay_stack", step_decode, demod.lpr_delay.init_state())

    # whole demod
    def step_demod(st, salt):
        s, (stereo, _) = demod(st, jax.lax.complex(y_re + salt, y_im))
        return s, stereo

    tm("demod_total", step_demod, realify(demod.init_state()))

    # --- audio substages --------------------------------------------------
    rs = pipe.audio_resamp.resamp
    L_i, M, tpp = rs.interp, rs.decim, rs.taps_per_phase
    G = jax.device_put(rs._G)
    R = rs._R
    log(f"audio poly: interp={L_i} decim={M} tpp={tpp} R={R} G={rs._G.shape}")

    def step_audio(st, salt):
        s, a = pipe.audio_resamp(st, stereo0 + salt)
        return s, a

    tm("audio_resamp", step_audio, realify(pipe.audio_resamp.init_state()))

    # variant: sum of R shifted matmuls, no frame concat
    n = stereo0.shape[-1]
    n_out = rs.out_len(n)
    A = n_out // L_i

    def step_audio_shift(st, salt):
        ext = jnp.concatenate(
            [jnp.broadcast_to(st, stereo0.shape[:-1] + (tpp - 1,)),
             stereo0 + salt], axis=-1)
        rows = A + R - 1
        xp = jnp.pad(ext, [(0, 0)] * (ext.ndim - 1) + [(0, rows * M - ext.shape[-1])])
        xr = xp.reshape(ext.shape[:-1] + (rows, M))
        acc = None
        for q in range(R):
            blk = jax.lax.dynamic_slice_in_dim(xr, q, A, axis=-2)  # (...,A,M)
            term = jnp.einsum("...am,mb->...ab", blk, G[q * M:(q + 1) * M])
            acc = term if acc is None else acc + term
        y = acc.reshape(ext.shape[:-1] + (n_out,))
        return st, y

    tm("audio_shiftmm", step_audio_shift, jnp.zeros((tpp - 1,), jnp.float32))

    a0 = jax.jit(lambda s, sa: pipe.audio_resamp(complexify(s), stereo0)[1])(
        realify(pipe.audio_resamp.init_state()), 0.0)

    def step_deemph(st, salt):
        s, a = pipe.deemph(st, a0 + salt)
        return s, a

    tm("deemph", step_deemph, realify(pipe.deemph.init_state()))

    # deemphasis FIR via banded-Toeplitz matmuls
    de_taps = pipe.deemph._fir
    Tde = len(de_taps)

    def step_deemph_mm(st, salt):
        xpad = jnp.pad(a0 + salt,
                       [(0, 0)] * (a0.ndim - 1) + [(Tde - 1, 0)])
        return st, matmul_correlate_valid(xpad, de_taps)

    tm("deemph_mm", step_deemph_mm, jnp.float32(0))

    log("\nsummary:")
    dem_parts = sum(results.get(k, 0) for k in
                    ("quad_atan2", "pilot_fir_16384", "envelope_norm",
                     "decode_delay_stack"))
    log(f"demod parts sum {dem_parts:.4f} vs total {results['demod_total']:.4f}")
    aud_parts = results.get("audio_resamp", 0) + results.get("deemph", 0)
    log(f"audio parts sum {aud_parts:.4f}")


if __name__ == "__main__":
    main()
