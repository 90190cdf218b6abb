"""Pure DSP kernels: design-time tap/window math and jitted stream ops."""

from . import (  # noqa: F401
    demod,
    fir,
    iir,
    loops,
    mixer,
    resample,
    taps,
    util,
    wfm,
    windows,
)
