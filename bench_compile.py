"""Cold-compile breakdown for the flagship program (VERDICT r2 #3).

Measures, for the single-block step and the K-block steady-state
program: Python trace+lowering time (host), StableHLO size, backend
compile time (remote XLA/Mosaic through the tunnel), and cached-reload
time.  Prints one JSON line per phase to stdout (diagnostics on stderr).

Usage: python bench_compile.py [--no-cache]   (--no-cache points the
compilation cache at a throwaway dir to force a true cold compile)
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-cache", action="store_true",
                    help="use a throwaway compile-cache dir (true cold)")
    ap.add_argument("--k", type=int, default=256)
    ap.add_argument("--fs", type=float, default=10e6)
    ap.add_argument("--nvfo", type=int, default=8)
    args = ap.parse_args()

    cache = (tempfile.mkdtemp(prefix="jaxcache") if args.no_cache else
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache"))
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from sdrtpu.apps.wbfm_pipeline import WbfmMultiVfoPipeline
    from sdrtpu.graph.compile import complexify, realify

    fs_in, n_vfo, K = args.fs, args.nvfo, args.k
    m = WbfmMultiVfoPipeline.block_multiple(fs_in)
    block_len = (max(500_000, int(fs_in / 20)) // m) * m
    offsets = np.linspace(-0.4 * fs_in, 0.4 * fs_in, n_vfo)
    pipe = WbfmMultiVfoPipeline(offsets, fs_in, block_len,
                                channelizer_method="fft", spectrum=True)
    rng = np.random.default_rng(0)
    re = rng.standard_normal(block_len).astype(np.float32)
    im = rng.standard_normal(block_len).astype(np.float32)

    def single(rstate, re1, im1):
        st, (a, spec) = pipe(complexify(rstate), jax.lax.complex(re1, im1))
        return realify(st), (a, jnp.max(spec))

    def phase(name, fn, fn_args):
        t0 = time.time()
        lowered = jax.jit(fn).lower(*fn_args)
        t_trace = time.time() - t0
        hlo = lowered.as_text()
        t0 = time.time()
        compiled = lowered.compile()
        t_compile = time.time() - t0
        rec = {
            "phase": name,
            "config": f"{n_vfo}vfo_fs{fs_in:.0f}",
            "trace_lower_s": round(t_trace, 2),
            "backend_compile_s": round(t_compile, 2),
            "stablehlo_bytes": len(hlo),
            "stablehlo_lines": hlo.count("\n"),
        }
        print(json.dumps(rec), flush=True)
        return compiled

    state0 = realify(pipe.init_state())
    c1 = phase("single_block", single, (state0, re, im))
    rstate, _ = c1(state0, re, im)
    jax.block_until_ready(jax.tree_util.tree_leaves(rstate)[0])

    red = jax.device_put(re)
    imd = jax.device_put(im)

    def multi(rstate):
        st, (a, spec) = pipe.scan_repeat(
            complexify(rstate), jax.lax.complex(red, imd), K
        )
        return realify(st), (a, jnp.max(spec))

    phase(f"steady_state_K{K}", multi, (rstate,))

    # cached reload: a fresh jit of the same program should hit the
    # persistent cache (seconds, not minutes)
    t0 = time.time()
    jax.clear_caches()
    c3 = jax.jit(multi).lower(rstate).compile()
    print(json.dumps({"phase": f"cached_reload_K{K}",
                      "reload_s": round(time.time() - t0, 2)}), flush=True)
    del c3


if __name__ == "__main__":
    main()
