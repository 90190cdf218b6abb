"""Low-latency operating point: per-dispatch wall latency vs block size.

SURVEY §7 chose large blocks for throughput; this bench documents the
small-block trade (VERDICT r2 #8): for block sizes from 5 ms to 50 ms of
signal, one block per dispatch (K=1, the `--low-latency` CLI mode),
measures median wall time per dispatch (the user-visible added latency:
tunnel RTT + device compute), sustained single-stream throughput, and
real-time factor.  Prints one JSON line per block size (stderr has
diagnostics).
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from sdrtpu.apps.wbfm_pipeline import WbfmMultiVfoPipeline
    from sdrtpu.graph.compile import complexify, realify

    fs_in, n_vfo = 10e6, 8
    offsets = np.linspace(-0.4 * fs_in, 0.4 * fs_in, n_vfo)
    m = WbfmMultiVfoPipeline.block_multiple(fs_in)

    for want in (50_000, 100_000, 500_000):  # 5 / 10 / 50 ms of signal
        block_len = max(1, round(want / m)) * m
        pipe = WbfmMultiVfoPipeline(offsets, fs_in, block_len,
                                    channelizer_method="fft",
                                    spectrum=False)
        rng = np.random.default_rng(0)
        x = (rng.standard_normal(block_len)
             + 1j * rng.standard_normal(block_len)).astype(np.complex64)
        re = jax.device_put(x.real.astype(np.float32))
        im = jax.device_put(x.imag.astype(np.float32))

        @jax.jit
        def step(rstate):
            st, a = pipe(complexify(rstate), jax.lax.complex(re, im))
            return realify(st), a

        t0 = time.time()
        rstate, a = step(realify(pipe.init_state()))
        # force completion (block_until_ready can return early here)
        float(jnp.sum(a))
        compile_s = time.time() - t0
        rstate, a = step(rstate)
        float(jnp.sum(a))

        laps = []
        for _ in range(40):
            t0 = time.perf_counter()
            rstate, a = step(rstate)
            float(jnp.sum(a))  # fetch = the latency a live sink observes
            laps.append(time.perf_counter() - t0)
        laps = np.array(laps) * 1e3
        sig_ms = block_len / fs_in * 1e3
        med = float(np.median(laps))
        rec = {
            "metric": "flagship_dispatch_latency",
            "block_ms_of_signal": round(sig_ms, 1),
            "block_len": block_len,
            "median_dispatch_ms": round(med, 1),
            "p90_dispatch_ms": round(float(np.percentile(laps, 90)), 1),
            "rtf": round(sig_ms / med, 2),
            "single_stream_msps": round(block_len / (med / 1e3) / 1e6, 1),
            "compile_s": round(compile_s, 1),
        }
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
