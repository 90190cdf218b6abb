"""PSK demodulation chains and the Meteor M2 LRPT demodulator.

- `FastAgc` — exact reference recurrence (``loop/fast_agc.h:64-85``):
  ``out[i] = in[i]*gain; gain += (setPoint - |out[i]|)*rate``.  Substituting
  gives ``gain_i = (1 - rate*|in_i|)*gain_{i-1} + setPoint*rate`` — a linear
  recurrence with data-dependent coefficient, solved with an associative
  scan (fully parallel).  The max-gain clamp is applied post-hoc (only
  differs when the clamp actually engages).
- `MeteorCostas` — 4th-order Costas with the optional "broken modulation"
  error function for malfunctioning M2 birds
  (``meteor_demodulator/src/meteor_costas.h:33-56``).
- `Psk` — RRC -> FastAGC -> Costas(order) -> M&M
  (``core/src/dsp/demod/psk.h:138-143``).
- `MeteorDemod` — RRC -> FastAGC -> MeteorCostas -> optional OQPSK
  one-sample Q delay -> M&M (``meteor_demod.h:150-167``), default
  parameters from ``meteor_demodulator/src/main.cpp:66``: 72 ksym/s from
  150 ksps, RRC 33 taps beta 0.6, AGC rate 0.1, Costas bw 0.005,
  omegaGain 1e-6, muGain 0.01.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.block import StreamOp
from . import taps as tapsmod
from .clock import MuellerMuller
from .fir import Fir
from .iir import first_order_recurrence
from .loops import Costas, _wrap_pi, critically_damped


class FastAgc(StreamOp):
    """Multiplicative AGC, exact ``loop::FastAGC`` semantics via scan."""

    def __init__(
        self,
        set_point: float = 1.0,
        max_gain: float = 10e6,
        rate: float = 0.1,
        init_gain: float = 1.0,
    ):
        self.set_point = np.float32(set_point)
        self.max_gain = np.float32(max_gain)
        self.rate = np.float32(rate)
        self.init_gain = np.float32(init_gain)

    def init_state(self):
        return np.float32(self.init_gain)

    def __call__(self, state, x):
        g0 = jnp.asarray(state)
        amps = jnp.abs(x).astype(jnp.float32)
        a = 1.0 - self.rate * amps
        b = jnp.full_like(amps, self.set_point * self.rate)
        gains = first_order_recurrence(a, b, g0)
        gains = jnp.minimum(gains, self.max_gain)
        gains_prev = jnp.concatenate([g0[None], gains[:-1]])
        y = x * gains_prev.astype(x.real.dtype)
        return gains[-1], y


class MeteorCostas(StreamOp):
    """Costas(4) with optional broken-modulation error (``meteor_costas.h``)."""

    # Constellation phases of the malfunctioning M2 transmitter.
    BROKEN_PHASES = (
        0.47439988279190737,
        2.1777839908413044,
        3.8682349942715186,
        -0.29067248091319986,
    )

    def __init__(
        self,
        bandwidth: float,
        broken_modulation: bool = False,
        init_phase: float = 0.0,
        init_freq: float = 0.0,
        min_freq: float = -np.pi,
        max_freq: float = np.pi,
    ):
        self.alpha, self.beta = critically_damped(bandwidth)
        self.broken = broken_modulation
        self.init_phase = float(init_phase)
        self.init_freq = float(init_freq)
        self.min_freq = float(min_freq)
        self.max_freq = float(max_freq)

    def init_state(self):
        return (np.float32(self.init_phase), np.float32(self.init_freq))

    def _error(self, v):
        if not self.broken:
            step = lambda t: jnp.where(t > 0, 1.0, -1.0).astype(jnp.float32)
            err = step(v.real) * v.imag - step(v.imag) * v.real
        else:
            phase = jnp.arctan2(v.imag, v.real)
            dps = jnp.stack(
                [_wrap_pi(phase - np.float32(p)) for p in self.BROKEN_PHASES]
            )
            lowest = dps[jnp.argmin(jnp.abs(dps))]
            err = lowest * jnp.abs(v)
        return jnp.clip(err, -1.0, 1.0)

    def __call__(self, state, x):
        alpha = np.float32(self.alpha)
        beta = np.float32(self.beta)
        fmin = np.float32(self.min_freq)
        fmax = np.float32(self.max_freq)

        def step(carry, xi):
            phase, freq = carry
            out = xi * jax.lax.complex(jnp.cos(-phase), jnp.sin(-phase))
            err = self._error(out)
            freq = jnp.clip(freq + beta * err, fmin, fmax)
            phase = _wrap_pi(phase + freq + alpha * err)
            return (phase, freq), out

        state, y = jax.lax.scan(step, tuple(jnp.asarray(s) for s in state), x)
        return state, y


class Psk(StreamOp):
    """Generic PSK receive chain (``demod/psk.h``): returns masked symbols."""

    def __init__(
        self,
        order: int,
        symbolrate: float,
        samplerate: float,
        rrc_tap_count: int = 31,
        rrc_beta: float = 0.35,
        agc_rate: float = 0.1,
        costas_bandwidth: float = 0.005,
        omega_gain: float = 1e-6,
        mu_gain: float = 0.01,
        omega_rel_limit: float = 0.01,
    ):
        rrc_taps = tapsmod.root_raised_cosine_rate(
            rrc_tap_count, rrc_beta, symbolrate, samplerate
        )
        self.rrc = Fir(rrc_taps, dtype=jnp.complex64)
        self.agc = FastAgc(1.0, 10e6, agc_rate)
        self.costas = Costas(order, costas_bandwidth)
        self.recov = MuellerMuller(
            samplerate / symbolrate, omega_gain, mu_gain, omega_rel_limit
        )

    def max_out(self, n: int) -> int:
        return self.recov.max_out(n)

    def init_state(self):
        return {
            "rrc": self.rrc.init_state(),
            "agc": self.agc.init_state(),
            "costas": self.costas.init_state(),
            "mm": self.recov.init_state(),
        }

    def __call__(self, state, x):
        st = dict(state)
        st["rrc"], y = self.rrc(state["rrc"], x)
        st["agc"], y = self.agc(state["agc"], y)
        st["costas"], y = self.costas(state["costas"], y)
        st["mm"], (syms, valid) = self.recov(state["mm"], y)
        return st, (syms, valid)


class MeteorDemod(StreamOp):
    """Meteor M2 LRPT QPSK demodulator (``meteor_demod.h``)."""

    def __init__(
        self,
        symbolrate: float = 72000.0,
        samplerate: float = 150000.0,
        rrc_tap_count: int = 33,
        rrc_beta: float = 0.6,
        agc_rate: float = 0.1,
        costas_bandwidth: float = 0.005,
        broken_modulation: bool = False,
        oqpsk: bool = False,
        omega_gain: float = 1e-6,
        mu_gain: float = 0.01,
        omega_rel_limit: float = 0.01,
    ):
        rrc_taps = tapsmod.root_raised_cosine_rate(
            rrc_tap_count, rrc_beta, symbolrate, samplerate
        )
        self.rrc = Fir(rrc_taps, dtype=jnp.complex64)
        self.agc = FastAgc(1.0, 10e6, agc_rate)
        self.costas = MeteorCostas(costas_bandwidth, broken_modulation)
        self.oqpsk = oqpsk
        self.recov = MuellerMuller(
            samplerate / symbolrate, omega_gain, mu_gain, omega_rel_limit
        )

    def max_out(self, n: int) -> int:
        return self.recov.max_out(n)

    def init_state(self):
        return {
            "rrc": self.rrc.init_state(),
            "agc": self.agc.init_state(),
            "costas": self.costas.init_state(),
            "last_i": np.float32(0.0),
            "mm": self.recov.init_state(),
        }

    def __call__(self, state, x):
        st = dict(state)
        st["rrc"], y = self.rrc(state["rrc"], x)
        st["agc"], y = self.agc(state["agc"], y)
        st["costas"], y = self.costas(state["costas"], y)
        if self.oqpsk:
            # one-sample delay on Q (``meteor_demod.h:157-163``)
            im_prev = jnp.concatenate(
                [jnp.asarray(state["last_i"])[None], y.imag[:-1]]
            )
            st["last_i"] = y.imag[-1]
            y = jax.lax.complex(y.real, im_prev)
        st["mm"], (syms, valid) = self.recov(state["mm"], y)
        return st, (syms, valid)


class Gfsk(StreamOp):
    """GFSK receive chain (``core/src/dsp/demod/gfsk.h``):

    quadrature discriminator -> RRC matched filter -> M&M (float mode).
    Output: masked real symbols (one per baud).
    """

    def __init__(
        self,
        symbolrate: float,
        samplerate: float,
        deviation_hz: float,
        rrc_tap_count: int = 33,
        rrc_beta: float = 0.35,
        omega_gain: float = 1e-6,
        mu_gain: float = 0.01,
        omega_rel_limit: float = 0.01,
    ):
        from .demod import Quadrature

        self.quad = Quadrature(deviation_hz, samplerate)
        rrc_taps = tapsmod.root_raised_cosine_rate(
            rrc_tap_count, rrc_beta, symbolrate, samplerate
        )
        self.rrc = Fir(rrc_taps, dtype=jnp.float32)
        self.recov = MuellerMuller(
            samplerate / symbolrate, omega_gain, mu_gain, omega_rel_limit,
            complex_mode=False,
        )

    def max_out(self, n: int) -> int:
        return self.recov.max_out(n)

    def init_state(self):
        return {
            "quad": self.quad.init_state(),
            "rrc": self.rrc.init_state(),
            "mm": self.recov.init_state(),
        }

    def __call__(self, state, x):
        st = dict(state)
        st["quad"], y = self.quad(state["quad"], x)
        st["rrc"], y = self.rrc(state["rrc"], y)
        st["mm"], (syms, valid) = self.recov(state["mm"], y)
        return st, (syms, valid)
