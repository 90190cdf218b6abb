"""Round-4c: attribute the 64-VFO composition gap.

Stage slopes sum to ~0.575 ms/block but the end-to-end pipeline runs
~0.695 — this times COMPOSED PREFIXES of the pipeline at the exact
steady-state granularity (sub-window = SUBK blocks) so the gap lands on
a specific stage boundary.
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

from sdrtpu.graph.compile import complexify, realify
from sdrtpu.roofline import slope_time
from sdrtpu.apps.wbfm_pipeline import WbfmMultiVfoPipeline


def log(*a):
    print(*a, flush=True)


def main():
    fs_in, n_vfo = 50e6, 64
    m = WbfmMultiVfoPipeline.block_multiple(fs_in)
    block_len = (max(500_000, int(fs_in / 20)) // m) * m
    offsets = np.linspace(-0.4 * fs_in, 0.4 * fs_in, n_vfo)
    pipe = WbfmMultiVfoPipeline(offsets, fs_in, block_len, spectrum=True)
    sub = pipe._subk(256)
    n = sub * block_len
    log(f"block_len={block_len} sub={sub} window={n}")

    rng = np.random.default_rng(0)
    t = np.arange(block_len) / fs_in
    x = np.zeros(block_len, np.complex64)
    for i, fc in enumerate(offsets):
        msg = np.sin(2 * np.pi * (500.0 + 300.0 * i) * t)
        ph = np.cumsum(2 * np.pi * 75000.0 * msg / fs_in)
        x += (0.02 * np.exp(1j * (2 * np.pi * fc * t + ph))).astype(np.complex64)
    re = jax.device_put(np.tile(x.real.astype(np.float32), sub))
    im = jax.device_put(np.tile(x.imag.astype(np.float32), sub))

    results = {}

    def tm(name, step, state0):
        st0 = jax.jit(
            lambda rs: realify(step(complexify(rs), jnp.float32(0))[0])
        )(state0)
        tt = slope_time(step, st0) / sub
        results[name] = tt * 1e3
        log(f"  {name:34s} {tt*1e3:8.4f} ms/block")

    # prefix 1: channelizer only
    def p1(st, salt):
        s, y = pipe.channelizer(st, jax.lax.complex(re + salt, im))
        return s, y

    tm("chan", p1, realify(pipe.channelizer.init_state()))

    # prefix 2: + demod
    def p2(st, salt):
        s1, y = pipe.channelizer(st["c"], jax.lax.complex(re + salt, im))
        s2, (stereo, _) = pipe.demod(st["d"], y)
        return {"c": s1, "d": s2}, stereo

    tm("chan+demod", p2, realify({"c": pipe.channelizer.init_state(),
                                  "d": pipe.demod.init_state()}))

    # prefix 3: + audio
    def p3(st, salt):
        s1, y = pipe.channelizer(st["c"], jax.lax.complex(re + salt, im))
        s2, (stereo, _) = pipe.demod(st["d"], y)
        s3, a = pipe.audio_resamp(st["a"], stereo)
        s4, a = pipe.deemph(st["e"], a)
        return {"c": s1, "d": s2, "a": s3, "e": s4}, a

    tm("chan+demod+audio", p3, realify({
        "c": pipe.channelizer.init_state(),
        "d": pipe.demod.init_state(),
        "a": pipe.audio_resamp.init_state(),
        "e": pipe.deemph.init_state()}))

    # full _batched (the real steady-state body incl. spectrum + framing)
    def p4(st, salt):
        s, out = pipe._batched(st, jax.lax.complex(re + salt, im), sub)
        return s, out[0]

    tm("full _batched", p4, realify(pipe.init_state()))

    log("\ndeltas: demod %.4f  audio %.4f  spectrum+framing %.4f"
        % (results["chan+demod"] - results["chan"],
           results["chan+demod+audio"] - results["chan+demod"],
           results["full _batched"] - results["chan+demod+audio"]))


if __name__ == "__main__":
    main()
