"""Symbol timing recovery.

`MuellerMuller` reimplements ``dsp::clock_recovery::MM``
(``core/src/dsp/clock_recovery/mm.h:100-156``) exactly: a polyphase-bank
fractional interpolator (default 128 phases x 8 taps, Nuttall windowed
sinc, ``mm.h:161-166``) driven by a 2nd-order loop whose per-output input
stride is data dependent (``offset += floor(phase)``).

TPU mapping (SURVEY §7 "hard parts"): the data-dependent stride forces a
`lax.scan` *over output symbols* with a fixed maximum count and a validity
mask — static shapes at the cost of a bounded amount of wasted work.  The
scan body is tiny (8-tap dot + loop update), and symbol rates are low
(... <= a few hundred kbaud), so this is cheap relative to the wideband
front end.

`feedforward_symbol_sync` is the block-parallel TPU-native alternative:
Oerder & Meyr square-law timing estimation per block + polyphase
interpolation at the estimated phase — no sequential carry; used where
throughput matters more than bit-exact parity with the reference loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.block import StreamOp
from . import taps as tapsmod
from .resample import build_polyphase_bank


def interp_bank(phase_count: int = 128, tap_count: int = 8) -> np.ndarray:
    """Fractional-delay interpolator bank (``mm.h:generateInterpTaps``)."""
    bw = 0.5 / phase_count
    proto = tapsmod.windowed_sinc(
        phase_count * tap_count,
        tapsmod.hz_to_rads(bw, 1.0),
        norm=phase_count,
    )
    return build_polyphase_bank(phase_count, proto)


class MuellerMuller(StreamOp):
    """M&M symbol synchronizer with masked static-shape outputs.

    ``omega``: nominal samples per symbol.  Returns (symbols, valid) where
    ``symbols`` has length ``max_out(n)`` and ``valid`` marks real symbols.
    ``complex_mode`` selects the complex error equation (``mm.h:124-140``)
    vs the float one (``mm.h:119-122``).
    """

    def __init__(
        self,
        omega: float,
        omega_gain: float,
        mu_gain: float,
        omega_rel_limit: float,
        interp_phase_count: int = 128,
        interp_tap_count: int = 8,
        complex_mode: bool = True,
    ):
        self.omega = float(omega)
        self.omega_gain = float(omega_gain)
        self.mu_gain = float(mu_gain)
        self.omega_rel_limit = float(omega_rel_limit)
        self.P = int(interp_phase_count)
        self.T = int(interp_tap_count)
        self.complex_mode = complex_mode
        self.bank = interp_bank(self.P, self.T)  # (P, T) host numpy
        self.dtype = np.complex64 if complex_mode else np.float32

    def max_out(self, n: int) -> int:
        # worst-case per-symbol advance: freq clamps at fmin but the mu
        # term still subtracts a clipped err (advance = freq + mu_gain*err,
        # err in [-1, 1]) — bounding by fmin alone can drop symbols when
        # err stays pinned negative.  Floor at 1 sample/symbol (advance
        # below that is nonphysical for omega >= 1 syncs).
        worst = max(
            self.omega * (1.0 - self.omega_rel_limit) - self.mu_gain, 1.0
        )
        return int(np.ceil(n / worst)) + 2

    def init_state(self):
        return {
            "tail": np.zeros(self.T - 1, self.dtype),
            "offset": np.int32(0),
            "phase": np.float32(0.0),
            "freq": np.float32(self.omega),
            # float-mode error memory
            "last_out": np.float32(0.0),
            # complex-mode error memory (p = interpolated, c = sign)
            "p1": np.zeros((), np.complex64),
            "p2": np.zeros((), np.complex64),
            "c1": np.zeros((), np.complex64),
            "c2": np.zeros((), np.complex64),
        }

    def __call__(self, state, x):
        n = x.shape[-1]
        n_out = self.max_out(n)
        ext = jnp.concatenate([jnp.asarray(state["tail"]), x.astype(self.dtype)])
        bank = jnp.asarray(self.bank)
        fmin = np.float32(self.omega * (1.0 - self.omega_rel_limit))
        fmax = np.float32(self.omega * (1.0 + self.omega_rel_limit))
        og = np.float32(self.omega_gain)
        mg = np.float32(self.mu_gain)

        csign = lambda v: jax.lax.complex(
            jnp.where(v.real > 0, 1.0, -1.0), jnp.where(v.imag > 0, 1.0, -1.0)
        )

        def step(carry, _):
            offset, phase, freq, last, p1, p2, c1, c2 = carry
            valid = offset < n
            ph_idx = jnp.clip(
                jnp.floor(phase * self.P).astype(jnp.int32), 0, self.P - 1
            )
            window = jax.lax.dynamic_slice_in_dim(ext, offset, self.T)
            taps = bank[ph_idx]
            if self.complex_mode:
                out = jnp.sum(window * taps)
                p0, c0 = out, csign(out)
                err = (((p0 - p2) * jnp.conj(c1)) - ((c0 - c2) * jnp.conj(p1))).real
                np1, np2 = p0, p1
                nc1, nc2 = c0, c1
                nlast = last
            else:
                out = jnp.sum(window * taps)
                sgn = lambda t: jnp.where(t > 0, 1.0, -1.0)
                err = sgn(last) * out - last * sgn(out)
                nlast = out
                np1, np2, nc1, nc2 = p1, p2, c1, c2
            err = jnp.clip(err, -1.0, 1.0)
            nfreq = jnp.clip(freq + og * err, fmin, fmax)
            nphase = phase + nfreq + mg * err
            delta = jnp.floor(nphase)
            noffset = offset + delta.astype(jnp.int32)
            nphase = nphase - delta
            # only advance when this output was valid
            out_c = (
                jnp.where(valid, out, 0.0)
                if not self.complex_mode
                else jnp.where(valid, out, 0.0 + 0.0j)
            )
            carry = tuple(
                jnp.where(valid, a, b)
                for a, b in zip(
                    (noffset, nphase, nfreq, nlast, np1, np2, nc1, nc2),
                    (offset, phase, freq, last, p1, p2, c1, c2),
                )
            )
            return carry, (out_c, valid)

        carry0 = (
            jnp.asarray(state["offset"]),
            jnp.asarray(state["phase"]),
            jnp.asarray(state["freq"]),
            jnp.asarray(state["last_out"]),
            jnp.asarray(state["p1"]),
            jnp.asarray(state["p2"]),
            jnp.asarray(state["c1"]),
            jnp.asarray(state["c2"]),
        )
        carry, (syms, valid) = jax.lax.scan(step, carry0, None, length=n_out)
        offset, phase, freq, last, p1, p2, c1, c2 = carry
        new_state = {
            "tail": ext[n:],
            "offset": offset - n,
            "phase": phase,
            "freq": freq,
            "last_out": last,
            "p1": p1,
            "p2": p2,
            "c1": c1,
            "c2": c2,
        }
        return new_state, (syms, valid)


def oerder_meyr_timing(x: jax.Array, sps: float) -> jax.Array:
    """Feedforward square-law timing estimate (Oerder & Meyr 1988).

    Returns the fractional symbol timing offset in [0, 1) estimated over
    the whole block: tau = -angle(sum |x[n]|^2 e^{-j2pi n/sps}) / 2pi.
    Block-parallel; no carry.
    """
    n = x.shape[-1]
    idx = jnp.arange(n, dtype=jnp.float32)
    w = jnp.exp(-2j * jnp.pi * idx / np.float32(sps))
    c = jnp.sum(jnp.abs(x) ** 2 * w, axis=-1)
    tau = -jnp.angle(c) / (2.0 * np.pi)
    return jnp.mod(tau, 1.0)


class FeedforwardSymbolSync(StreamOp):
    """Block-parallel symbol sync: O&M timing + polyphase interpolation.

    Emits exactly floor(n/sps) symbols per block with the bank phase chosen
    from the per-block timing estimate.  Suitable when the symbol clock is
    stable within a block (large blocks, broadcast-grade sources).
    """

    def __init__(self, sps: float, interp_phase_count: int = 128, interp_tap_count: int = 8):
        assert abs(sps - round(sps)) < 1e-9, (
            "feedforward sync requires integer samples/symbol; use "
            "a resampler upstream or MuellerMuller for fractional rates"
        )
        self.sps = int(round(sps))
        self.P = interp_phase_count
        self.T = interp_tap_count
        self.bank = interp_bank(self.P, self.T)

    def init_state(self):
        return np.zeros(self.T - 1 + self.sps, np.complex64)

    def out_len(self, n: int) -> int:
        return n // self.sps

    def __call__(self, state, x):
        n = x.shape[-1]
        n_sym = n // self.sps
        ext = jnp.concatenate([jnp.asarray(state), x.astype(jnp.complex64)])
        tau = oerder_meyr_timing(x, self.sps)  # in symbols
        frac = tau * self.sps  # in samples
        base = jnp.floor(frac).astype(jnp.int32)
        ph = jnp.clip(
            jnp.floor((frac - base) * self.P).astype(jnp.int32), 0, self.P - 1
        )
        taps = jnp.asarray(self.bank)[ph]  # (T,)
        # windows at sample positions base + k*sps
        k = jnp.arange(n_sym, dtype=jnp.int32) * self.sps
        t = jnp.arange(self.T, dtype=jnp.int32)
        frames = ext[(base + k)[:, None] + t[None, :]]
        syms = frames @ taps
        return ext[n:], syms
