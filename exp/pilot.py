"""Round-4 experiment: pilot-FIR overlap-save FFT size on the demod shapes.

The WFM pilot bandpass (317 complex taps) on (C, n_if) rows currently
takes the single-FFT plan for rows <= 32k (e.g. (64, 12500) -> one
16384-point FFT per row).  The round-4 FFT shape sweep showed length
~128-2048 FFT batches run 3-8x faster per point than >16k sizes, so
chunked overlap-save with a small nfft may win even for short rows.
Times fft_correlate_valid under forced nfft plans.
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

from sdrtpu.roofline import slope_time
from sdrtpu.kernels import fir as firmod
from sdrtpu.kernels import taps as tapsmod


def log(*a):
    print(*a, flush=True)


def main():
    rng = np.random.default_rng(0)
    taps = tapsmod.band_pass(18750.0, 19250.0, 3000.0, 250000.0,
                             odd_tap_count=True)
    T = len(taps)
    log(f"pilot taps T={T} complex={np.iscomplexobj(taps)}")

    for (C, L) in [(64, 12500), (8, 100000), (8, 400000)]:
        re = jax.device_put(rng.standard_normal((C, L)).astype(np.float32))
        im = jax.device_put(rng.standard_normal((C, L)).astype(np.float32))

        orig = firmod._plan_corr_nfft
        for nfft in (None, 512, 1024, 2048, 4096):
            if nfft is None:
                firmod._plan_corr_nfft = orig
                label = "auto"
            else:
                firmod._plan_corr_nfft = lambda L_, T_, n=nfft: n
                label = str(nfft)

            def step(st, salt):
                y = firmod.fft_correlate_valid(
                    jax.lax.complex(re + salt, im), taps
                )
                return st, y

            t = slope_time(step, jnp.float32(0))
            log(f"  ({C:3d},{L:6d}) nfft={label:5s} {t*1e3:8.4f} ms  "
                f"{C*L/t/1e9:6.2f} Gpts/s")
        firmod._plan_corr_nfft = orig


if __name__ == "__main__":
    main()
