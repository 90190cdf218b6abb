"""Frequency translation (complex mixing) as a block-parallel phase ramp.

The reference's ``FrequencyXlator`` is a sequential VOLK rotator carrying a
running phasor (``core/src/dsp/channel/frequency_xlator.h:43-58``).  On TPU
the rotation is closed-form — ``y[n] = x[n] * exp(i*(phi0 + omega*n))`` —
with no sequential dependence.

Numerical care: ``omega * n`` grows to ~1e6 rad over a 1 MSample block and
float32 cannot represent that with usable phase precision.  We therefore
build the wrapped ramp hierarchically at trace time: exact float64 NumPy
tables of ``omega*k mod 2pi`` for a coarse grid (every K samples) and a fine
grid (0..K), combined on device with one broadcast add + wrap.  Phase error
stays at float32 rounding (~1e-7 rad), far below any demod SNR floor.

Per-block phase advance ``(omega*N) mod 2pi`` is computed in float64 on the
host so the carried phase never accumulates magnitude.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.block import StreamOp

_TWO_PI = 2.0 * np.pi
_FINE = 1024  # fine-table length; coarse table covers multiples of _FINE


class FreqXlator(StreamOp):
    """Multiply by exp(i*2pi*offset/fs * n), phase-continuous across blocks.

    Positive ``offset_hz`` rotates the spectrum *up* by ``offset_hz``
    (matching ``FrequencyXlator::init`` semantics); to bring a channel at
    +f down to baseband pass ``-f`` (as ``RxVFO`` does).
    """

    def __init__(self, offset_hz: float, samplerate: float):
        self.offset_hz = float(offset_hz)
        self.samplerate = float(samplerate)
        # Keep omega in exact double precision on the host.
        self._omega = _TWO_PI * (self.offset_hz / self.samplerate)
        self._ramp_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def init_state(self):
        return np.zeros((), np.float32)

    def _tables(self, n: int):
        """Host-precomputed wrapped phase tables for block length n."""
        key = n
        if key not in self._ramp_cache:
            fine = min(_FINE, n)
            n_coarse = -(-n // fine)
            fine_t = np.mod(self._omega * np.arange(fine, dtype=np.float64), _TWO_PI)
            coarse_t = np.mod(
                self._omega * fine * np.arange(n_coarse, dtype=np.float64), _TWO_PI
            )
            self._ramp_cache[key] = (
                coarse_t.astype(np.float32),
                fine_t.astype(np.float32),
            )
        return self._ramp_cache[key]

    def _block_delta(self, n: int) -> float:
        return float(np.mod(self._omega * n, _TWO_PI))

    def __call__(self, state, x):
        n = x.shape[-1]
        coarse, fine = self._tables(n)
        coarse = jnp.asarray(coarse)
        fine = jnp.asarray(fine)
        angles = (coarse[:, None] + fine[None, :]).reshape(-1)[:n]
        angles = jnp.mod(angles + state, np.float32(_TWO_PI))
        y = x * jax.lax.complex(jnp.cos(angles), jnp.sin(angles))
        new_phase = jnp.mod(state + np.float32(self._block_delta(n)), np.float32(_TWO_PI))
        return new_phase, y


class TunableXlator(StreamOp):
    """`FreqXlator` variant whose phase tables live in the STATE pytree.

    Same hierarchical wrapped-ramp math, but the per-block tables are
    state leaves instead of trace-time constants, so the offset can be
    changed by a host-side table swap with NO retrace
    (`retune_state`) — the live-retune path for per-VFO DDCs, matching
    the reference's mutate-in-place ``setOffset`` (``rx_vfo.h:72-77``).
    The block length is fixed at construction (bind time).
    """

    def __init__(self, offset_hz: float, samplerate: float, block_len: int):
        self.offset_hz = float(offset_hz)
        self.samplerate = float(samplerate)
        self.block_len = int(block_len)

    def _tables(self, offset_hz: float) -> dict:
        omega = _TWO_PI * (float(offset_hz) / self.samplerate)
        n = self.block_len
        fine = min(_FINE, n)
        n_coarse = -(-n // fine)
        return {
            "fine": np.mod(
                omega * np.arange(fine, dtype=np.float64), _TWO_PI
            ).astype(np.float32),
            "coarse": np.mod(
                omega * fine * np.arange(n_coarse, dtype=np.float64), _TWO_PI
            ).astype(np.float32),
            "delta": np.float32(np.mod(omega * n, _TWO_PI)),
        }

    def init_state(self):
        st = self._tables(self.offset_hz)
        st["phase"] = np.float32(0.0)
        return st

    def retune_state(self, state, offset_hz: float) -> dict:
        """Swap in tables for a new offset; phase stays continuous."""
        self.offset_hz = float(offset_hz)
        st = self._tables(offset_hz)
        st["phase"] = state["phase"]
        return st

    def __call__(self, state, x):
        n = x.shape[-1]
        assert n == self.block_len, (n, self.block_len)
        coarse = jnp.asarray(state["coarse"])
        fine = jnp.asarray(state["fine"])
        angles = (coarse[:, None] + fine[None, :]).reshape(-1)[:n]
        angles = jnp.mod(
            angles + jnp.asarray(state["phase"]), np.float32(_TWO_PI)
        )
        y = x * jax.lax.complex(jnp.cos(angles), jnp.sin(angles))
        new_phase = jnp.mod(
            jnp.asarray(state["phase"]) + jnp.asarray(state["delta"]),
            np.float32(_TWO_PI),
        )
        return {**state, "phase": new_phase}, y
