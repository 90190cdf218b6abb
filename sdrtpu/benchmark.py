"""Throughput measurement utility — ``dsp::bench::SpeedTester`` capability.

The reference feeds random buffers through one block and reports
samples/sec (``core/src/dsp/bench/speed_tester.h:31-56``).  This is the
TPU-aware equivalent with the measurement discipline this runtime needs:
serialized dispatch chains and fetch-forced completion (plain
`block_until_ready` can return before execution finishes here).

    from sdrtpu.benchmark import measure_op
    print(measure_op(Fir(taps), block_shape=(500000,), dtype=np.complex64))
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from .graph.compile import complexify, realify


def measure_op(
    op,
    block_shape: tuple[int, ...],
    dtype=np.complex64,
    k_blocks: int = 4,
    n_dispatch: int = 4,
    reps: int = 3,
    seed: int = 0,
) -> dict:
    """Measure sustained samples/s of a StreamOp on the default backend."""
    rng = np.random.default_rng(seed)
    re = jax.device_put(
        rng.standard_normal((k_blocks,) + block_shape).astype(np.float32)
    )
    im = jax.device_put(
        rng.standard_normal((k_blocks,) + block_shape).astype(np.float32)
    )
    complex_in = np.issubdtype(np.dtype(dtype), np.complexfloating)

    def single(rstate, a, b):
        x = jax.lax.complex(a, b) if complex_in else a
        st, y = op(complexify(rstate), x)
        if isinstance(y, tuple):
            y = y[0]
        leaves = jax.tree_util.tree_leaves(realify(y))
        return realify(st), sum(jnp.sum(l) for l in leaves)

    warm = jax.jit(single)
    t0 = time.time()
    rstate, p = warm(realify(op.init_state()), re[0], im[0])
    _ = float(p)
    compile_s = time.time() - t0

    @jax.jit
    def multi(rstate, re, im):
        def body(rst, xs):
            return single(rst, xs[0], xs[1])

        rstate, probes = jax.lax.scan(body, rstate, jnp.stack([re, im], 1))
        return rstate, jnp.sum(probes)

    rstate, p = multi(rstate, re, im)
    _ = float(p)

    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        for _ in range(n_dispatch):
            rstate, p = multi(rstate, re, im)
        _ = float(p)  # fetch forces completion
        best = min(best, (time.time() - t0) / n_dispatch)

    n_samples = k_blocks * int(np.prod(block_shape))
    return {
        "samples_per_dispatch": n_samples,
        "seconds_per_dispatch": best,
        "msps": n_samples / best / 1e6,
        "compile_seconds": compile_s,
        "backend": jax.devices()[0].platform,
    }
