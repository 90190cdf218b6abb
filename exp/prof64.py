"""Round-4 experiment: sub-stage timing of the 64-VFO/50-Msps pipeline.

Times each piece of the FftDecimatorChain (chunk formation, forward FFT,
alias fold, IFFT, trim+rotator) plus the demod/audio back end with the
slope method, at the exact shapes the bench runs, to locate the gap
between the 2635 Msps measured end-to-end and the ~0.31 ms modeled
channelizer time.  Not shipped; scratch instrumentation.

Usage: python exp/prof64.py [--fs 50e6 --nvfo 64]
"""

import argparse
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

from sdrtpu.graph.compile import complexify, realify
from sdrtpu.roofline import slope_time
from sdrtpu.apps.wbfm_pipeline import WbfmMultiVfoPipeline


def log(*a):
    print(*a, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fs", type=float, default=50e6)
    ap.add_argument("--nvfo", type=int, default=64)
    ap.add_argument("--k", type=int, default=1, help="blocks per window (SUBK)")
    args = ap.parse_args()

    fs_in = args.fs
    n_vfo = args.nvfo
    m = WbfmMultiVfoPipeline.block_multiple(fs_in)
    block_len = (max(500_000, int(fs_in / 20)) // m) * m
    offsets = np.linspace(-0.4 * fs_in, 0.4 * fs_in, n_vfo)
    pipe = WbfmMultiVfoPipeline(offsets, fs_in, block_len, spectrum=True)
    chain = pipe.channelizer.fused
    log(f"block_len={block_len} P={chain.n_chunks} valid={chain.valid} "
        f"nfft={chain.nfft} R={chain.ratio} nif={chain.nif} tpad={chain.tpad} "
        f"C={chain.n_channels}")

    rng = np.random.default_rng(0)
    x = (rng.standard_normal(block_len) + 1j * rng.standard_normal(block_len)).astype(np.complex64) * 0.05
    re = jax.device_put(x.real.astype(np.float32))
    im = jax.device_put(x.imag.astype(np.float32))

    K = args.k
    n = block_len * K
    P, V, F = K * chain.n_chunks, chain.valid, chain.nfft
    R, nif = chain.ratio, chain.nif
    C = chain.n_channels

    results = {}

    def tm(name, step, state0, per_block=1.0):
        t = slope_time(step, state0) / per_block
        results[name] = t * 1e3
        log(f"  {name:28s} {t*1e3:8.4f} ms/block")
        return t

    # --- stage 0: chunk formation (ext -> (P, nfft)) ---------------------
    tail0 = realify(np.zeros(chain.tpad - 1, np.complex64))

    def chunks_of(ext):
        Q = -(-F // V)
        rows_n = P + Q - 1
        xp = jnp.pad(ext, (0, rows_n * V - ext.shape[-1]))
        rows = xp.reshape(rows_n, V)
        ck = jnp.concatenate(
            [jax.lax.dynamic_slice_in_dim(rows, q, P, axis=0) for q in range(Q)],
            axis=-1,
        )[:, :F]
        return ck

    def step_chunks(st, salt):
        ext = jnp.concatenate([complexify(st), jax.lax.complex(re + salt, im)])
        ck = chunks_of(ext)
        return realify(ext[block_len:]), ck

    tm("chunk_form", step_chunks, tail0)

    # --- stage 1: forward FFT -------------------------------------------
    ck0 = jax.jit(lambda s: step_chunks(s, jnp.float32(0))[1])(tail0)
    ck_re = jnp.real(ck0)
    ck_im = jnp.imag(ck0)

    def step_fft(st, salt):
        X = jnp.fft.fft(jax.lax.complex(ck_re + salt, ck_im))
        return st, X

    tm("fwd_fft", step_fft, jnp.float32(0))

    # --- stage 2: alias-fold einsum -------------------------------------
    def _planes(f, *args):
        out = jax.jit(lambda *a: (jnp.real(f(*a)), jnp.imag(f(*a))))(*args)
        return out

    X_re, X_im = _planes(lambda: jnp.fft.fft(jax.lax.complex(ck_re, ck_im)))
    hf_re = jax.device_put(np.ascontiguousarray(chain._hf_folded.real, np.float32))
    hf_im = jax.device_put(np.ascontiguousarray(chain._hf_folded.imag, np.float32))

    def step_fold(st, salt):
        X = jax.lax.complex(X_re + salt, X_im).reshape(P, R, nif)
        h = jax.lax.complex(hf_re, hf_im)
        S = jnp.einsum("prk,crk->cpk", X, h) / R
        return st, S

    tm("fold_einsum", step_fold, jnp.float32(0))

    # --- stage 3: IFFT + trim -------------------------------------------
    S_re, S_im = _planes(lambda: jnp.einsum(
        "prk,crk->cpk",
        jax.lax.complex(X_re, X_im).reshape(P, R, nif),
        jax.lax.complex(hf_re, hf_im)) / R)

    def step_ifft(st, salt):
        y = jnp.fft.ifft(jax.lax.complex(S_re + salt, S_im))
        m0 = (chain.tpad - 1) // R
        y = y[:, :, m0 : m0 + V // R].reshape(C, n // R)
        return st, y

    tm("ifft_trim", step_ifft, jnp.float32(0))

    # --- stage 4: residual rotator --------------------------------------
    y_re, y_im = _planes(lambda: jnp.fft.ifft(jax.lax.complex(S_re, S_im))[
        :, :, (chain.tpad - 1) // R : (chain.tpad - 1) // R + V // R
    ].reshape(C, n // R))
    rot0 = realify(chain.rot.init_state())

    def step_rot(st, salt):
        s, y = chain.rot(complexify(st), jax.lax.complex(y_re + salt, y_im))
        return realify(s), y

    tm("rotator", step_rot, rot0)

    # --- trim+reshape is part of ifft step above; also time ifft alone --
    def step_ifft_only(st, salt):
        y = jnp.fft.ifft(jax.lax.complex(S_re + salt, S_im))
        return st, y

    tm("ifft_only", step_ifft_only, jnp.float32(0))

    # --- whole channelizer ----------------------------------------------
    ch0 = realify(pipe.channelizer.init_state())

    def step_chan(st, salt):
        s, y = pipe.channelizer(complexify(st), jax.lax.complex(re + salt, im))
        return realify(s), y

    tm("channelizer_total", step_chan, ch0)

    # --- demod at batched granularity -----------------------------------
    d0 = realify(pipe.demod.init_state())
    d0 = jax.jit(lambda s: realify(pipe.demod(
        complexify(s), jax.lax.complex(y_re, y_im))[0]))(d0)

    def step_demod(st, salt):
        s, (stereo, _) = pipe.demod(complexify(st), jax.lax.complex(y_re + salt, y_im))
        return realify(s), stereo

    tm("wfm_demod", step_demod, d0, per_block=K)

    stereo0 = jax.jit(lambda: pipe.demod(
        complexify(d0), jax.lax.complex(y_re, y_im))[1][0])()

    # --- audio ----------------------------------------------------------
    a0 = realify({"rs": pipe.audio_resamp.init_state(),
                  "de": pipe.deemph.init_state()})

    def step_audio(st, salt):
        s = complexify(st)
        s1, a = pipe.audio_resamp(s["rs"], stereo0 + salt)
        s2, a = pipe.deemph(s["de"], a)
        return realify({"rs": s1, "de": s2}), a

    a0 = jax.jit(lambda s: step_audio(s, jnp.float32(0))[0])(a0)
    tm("audio_resamp_deemph", step_audio, a0, per_block=K)

    # --- spectrum --------------------------------------------------------
    if pipe.spectrum is not None:
        segs0 = pipe.spectrum.extract(jax.lax.complex(re, im))
        sre, sim = jnp.real(segs0), jnp.imag(segs0)

        def step_spec(st, salt):
            s = pipe.spectrum.transform(jax.lax.complex(sre + salt, sim))
            return jnp.maximum(st, jnp.max(s)), s

        tm("spectrum", step_spec, jnp.float32(-1e30))

    # --- end to end ------------------------------------------------------
    p0 = realify(pipe.init_state())

    def step_pipe(st, salt):
        s, out = pipe(complexify(st), jax.lax.complex(re + salt, im))
        return realify(s), out[0]

    p0 = jax.jit(lambda s: step_pipe(s, jnp.float32(0))[0])(p0)
    tm("pipeline_end_to_end", step_pipe, p0)

    parts = sum(v for k, v in results.items()
                if k in ("channelizer_total", "wfm_demod",
                         "audio_resamp_deemph", "spectrum"))
    log(f"\nstage sum {parts:.4f} ms vs end-to-end "
        f"{results['pipeline_end_to_end']:.4f} ms; "
        f"end-to-end -> {block_len/results['pipeline_end_to_end']/1e3:.0f} Msps")
    sub = sum(v for k, v in results.items()
              if k in ("chunk_form", "fwd_fft", "fold_einsum", "ifft_trim",
                       "rotator"))
    log(f"channelizer parts sum {sub:.4f} ms vs total "
        f"{results['channelizer_total']:.4f} ms")


if __name__ == "__main__":
    main()
