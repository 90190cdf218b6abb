"""Low-latency operating point: per-dispatch wall latency vs block size.

SURVEY §7 chose large blocks for throughput; this bench documents the
small-block trade (VERDICT r2 #8): for block sizes from 5 ms to 50 ms of
signal, one block per dispatch (K=1, the `--low-latency` CLI mode).

Two dispatch disciplines per block size:

- **serial** (round-3): dispatch -> fetch -> dispatch.  Each block pays
  the full tunnel RTT; the user-visible latency and the sustained rate
  coincide.
- **pipelined** (round-4, VERDICT r3 #5): keep ``DEPTH`` dispatches in
  flight — JAX async dispatch lets the host enqueue block i+1..i+D while
  block i executes, so device compute overlaps the ~25 ms RTT.  The
  loop dispatches, then fetches the (i-D)-th block's probe.  Sustained
  real-time factor is wall/N; per-block latency is issue->fetch-return
  for the same block.  If the tunnel serializes dispatches, sustained
  == serial and that is the documented deployment constraint.

Prints one JSON line per block size (stderr has diagnostics).
"""

import json
import os
import sys
import time
from collections import deque

import numpy as np
import jax
import jax.numpy as jnp

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

DEPTH = int(os.environ.get("SDRTPU_LAT_DEPTH", 8))
N_BLOCKS = int(os.environ.get("SDRTPU_LAT_BLOCKS", 64))


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
            # scalar probe: fetching it forces completion of THIS block
            # without pulling the audio through the tunnel
            return realify(st), a, jnp.sum(a)

        t0 = time.time()
        rstate, a, p = step(realify(pipe.init_state()))
        float(p)  # force completion (block_until_ready can return early)
        compile_s = time.time() - t0
        rstate, a, p = step(rstate)
        float(p)

        # --- serial discipline (user-visible latency per block) ----------
        laps = []
        for _ in range(40):
            t0 = time.perf_counter()
            rstate, a, p = step(rstate)
            float(p)  # fetch = the latency a live sink observes
            laps.append(time.perf_counter() - t0)
        laps = np.array(laps) * 1e3
        sig_ms = block_len / fs_in * 1e3
        med = float(np.median(laps))

        # --- pipelined discipline (DEPTH dispatches in flight) -----------
        # fill the pipe OUTSIDE the timed window, and stop the clock
        # BEFORE draining the tail: wall/N otherwise amortizes ~DEPTH
        # serial drain RTTs into the "sustained" figure
        inflight = deque()
        lat = []
        for _ in range(DEPTH):  # fill
            rstate, a, p = step(rstate)
            inflight.append((time.perf_counter(), p))
        t_start = time.perf_counter()
        for i in range(N_BLOCKS):
            rstate, a, p = step(rstate)
            inflight.append((time.perf_counter(), p))
            t_issue, probe = inflight.popleft()
            float(probe)
            lat.append(time.perf_counter() - t_issue)
        wall = time.perf_counter() - t_start
        while inflight:  # drain, untimed
            t_issue, probe = inflight.popleft()
            float(probe)
            lat.append(time.perf_counter() - t_issue)
        sustained_ms = wall / N_BLOCKS * 1e3
        lat = np.array(lat) * 1e3

        # --- threaded-fetch discipline: overlap the per-fetch RTTs -------
        # The pipelined loop above shows each synchronous probe fetch
        # occupies the host for a full tunnel RTT (dispatches overlap,
        # fetches don't).  A real deployment's sink is asynchronous: a
        # small consumer pool drains completions while the producer keeps
        # dispatching, so T fetch RTTs run concurrently.
        from concurrent.futures import ThreadPoolExecutor

        # The pool must cover RTT/block_interval concurrent fetches or
        # the producer stalls waiting for a free worker: at a ~27 ms
        # RTT and 5 ms blocks that is ~6 in flight (4 workers measured
        # RTF 0.66 on a 27 ms day; 8 workers 1.10).  Auto-sized from the
        # MEASURED fetch RTT (VERDICT r4 #4a): ceil(RTT/interval)+1,
        # clamped to [2, 16]; SDRTPU_LAT_THREADS overrides.
        rtt = float(np.median(laps)) / 1e3  # serial lap ~ fetch RTT bound
        auto_T = min(16, max(2, int(np.ceil(rtt / (sig_ms / 1e3))) + 1))
        T = int(os.environ.get("SDRTPU_LAT_THREADS", auto_T))
        ex = ThreadPoolExecutor(max_workers=T)
        futs = deque()
        tlat = []
        for _ in range(DEPTH):  # fill, untimed
            rstate, a, p = step(rstate)
            futs.append((time.perf_counter(), ex.submit(float, p)))
        t_start = time.perf_counter()
        for i in range(N_BLOCKS):
            rstate, a, p = step(rstate)
            futs.append((time.perf_counter(), ex.submit(float, p)))
            t_i, f = futs.popleft()
            f.result()
            tlat.append(time.perf_counter() - t_i)
        twall = time.perf_counter() - t_start
        while futs:  # drain, untimed
            t_i, f = futs.popleft()
            f.result()
            tlat.append(time.perf_counter() - t_i)
        ex.shutdown()
        tsustained_ms = twall / N_BLOCKS * 1e3
        tlat = np.array(tlat) * 1e3

        rec = {
            "metric": "flagship_dispatch_latency",
            "block_ms_of_signal": round(sig_ms, 1),
            "block_len": block_len,
            "median_dispatch_ms": round(med, 1),
            "p90_dispatch_ms": round(float(np.percentile(laps, 90)), 1),
            "rtf": round(sig_ms / med, 2),
            "single_stream_msps": round(block_len / (med / 1e3) / 1e6, 1),
            "pipelined_depth": DEPTH,
            "pipelined_sustained_ms_per_block": round(sustained_ms, 2),
            "pipelined_rtf": round(sig_ms / sustained_ms, 2),
            "pipelined_latency_ms_median": round(float(np.median(lat)), 1),
            "pipelined_latency_ms_p90": round(
                float(np.percentile(lat, 90)), 1),
            "threaded_fetch_workers": T,
            "threaded_fetch_workers_auto": auto_T,
            "threaded_sustained_ms_per_block": round(tsustained_ms, 2),
            "threaded_rtf": round(sig_ms / tsustained_ms, 2),
            "threaded_latency_ms_p50": round(float(np.median(tlat)), 1),
            "threaded_latency_ms_p95": round(
                float(np.percentile(tlat, 95)), 1),
            "compile_s": round(compile_s, 1),
        }
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
