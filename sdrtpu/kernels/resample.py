"""Multirate resampling: multistage integer decimation + polyphase L/M.

Replaces the reference's multirate stack (``core/src/dsp/multirate/``) with
a TPU-first design:

- `IntegerDecimator` — decimation by any integer ratio as a cascade of
  strided shift-and-add FIR stages.  The reference ships precomputed
  power-of-two half-band plan tables (``decim/plans.h``, "magic optimized
  FIR script"); we *design* stages on the fly with the classic multistage
  rule: each stage only needs to attenuate aliases that fold into the final
  output band, so early (high-rate) stages get very short filters.
- `PolyphaseResampler` — the reference's sequential per-output loop
  (``polyphase_resampler.h:69-99``) re-expressed in closed form.  Output
  indices group into a period of ``interp`` with affine offsets, so each of
  the ``interp`` phase positions is one strided shift-and-add over the
  block; no gathers, no sequential carry.  Phase/offset math and the
  polyphase bank layout (``polyphase_bank.h:28-33``) match the reference
  exactly.
- `RationalResampler` — auto-planner in the spirit of
  ``rational_resampler.h:120-165`` but smarter: instead of only power-of-2
  pre-decimation (which strands cases like 250k->48k with a 96-phase,
  9500-tap polyphase), it extracts the largest integer factor of the ratio
  first (250k->48k becomes int-decim 5 then 50k->48k with 24 phases).

All ops handle leading batch/channel dims (shape ``(..., n)``) so a
channelizer is just the same program with a channel axis.

Block framing: input block lengths must be multiples of
``block_multiple()`` so per-block output counts are constant and the
polyphase phase returns to zero — shapes stay static for XLA.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.block import StreamOp
from . import taps as tapsmod
from .fir import DecimatingFir


def build_polyphase_bank(interp: int, taps: np.ndarray) -> np.ndarray:
    """Split prototype taps into ``interp`` phases (``polyphase_bank.h``).

    Returns (interp, taps_per_phase) float32 with
    ``bank[p, t] = taps[t*interp + (interp-1-p)]`` (zero-padded).
    """
    interp = int(interp)
    tpp = -(-len(taps) // interp)
    padded = np.zeros(interp * tpp, dtype=np.float64)
    padded[: len(taps)] = np.asarray(taps, np.float64)
    bank = np.zeros((interp, tpp), dtype=np.float64)
    for i in range(interp * tpp):
        bank[(interp - 1) - (i % interp), i // interp] = padded[i]
    return bank.astype(np.float32)


def design_decimation_stages(
    in_rate: float, ratio: int, out_bw: float | None = None
) -> list[tuple[int, np.ndarray]]:
    """Factor an integer decimation into stages with per-stage filters.

    Returns [(decim_i, taps_i), ...].  Each stage's filter passes the final
    band (``out_bw``, default 40% of the final output rate) and stops at
    the next stage's folding edge — the multistage trick that keeps early
    filters short.
    """
    assert ratio >= 1
    final_rate = in_rate / ratio
    if out_bw is None:
        out_bw = 0.4 * final_rate

    # Factor ratio into stages, largest factors first (drop the rate fast).
    factors: list[int] = []
    d = ratio
    for p in (8, 7, 6, 5, 4, 3, 2):
        while d % p == 0 and d > 1:
            factors.append(p)
            d //= p
    if d > 1:  # leftover large prime factor: its own stage
        factors.append(d)
    factors.sort(reverse=True)

    stages = []
    r = in_rate
    for di in factors:
        r_next = r / di
        stop = r_next - out_bw
        trans = max(stop - out_bw, 0.05 * r_next)
        cutoff = min((out_bw + stop) / 2.0, 0.45 * r_next)
        taps = tapsmod.low_pass(cutoff, trans, r)
        stages.append((di, taps))
        r = r_next
    return stages


class IntegerDecimator(StreamOp):
    """Decimate by an arbitrary integer ratio (multistage strided FIRs).

    Capability superset of ``dsp::multirate::PowerDecimator``
    (``power_decimator.h``): any integer ratio, filters designed on the fly.
    """

    def __init__(
        self, in_rate: float, ratio: int, dtype=jnp.complex64, out_bw: float | None = None
    ):
        self.ratio = int(ratio)
        self.dtype = dtype
        self.stages = [
            DecimatingFir(taps, d, dtype)
            for d, taps in design_decimation_stages(in_rate, ratio, out_bw)
        ]

    def init_state(self):
        return tuple(s.init_state() for s in self.stages)

    def out_len(self, n: int) -> int:
        assert n % self.ratio == 0
        return n // self.ratio

    def __call__(self, state, x):
        new_states = []
        for s, st in zip(self.stages, state):
            st, x = s(st, x)
            new_states.append(st)
        return tuple(new_states), x


class PolyphaseResampler(StreamOp):
    """L/M polyphase interpolator-decimator, block-parallel.

    Reference semantics (``polyphase_resampler.h:69-99``): output k uses
    ``phase_k = (k*decim) % interp`` and window start
    ``offset_k = (k*decim) // interp`` into [tail ++ x].  Since
    ``offset_{k+interp} = offset_k + decim``, outputs reshape to
    ``(A, interp)`` and each phase column b is one strided shift-and-add:

        out[a, b] = sum_t bank[p_b, t] * ext[a*decim + off_b + t]

    Methods:

    - ``"matmul"`` (default for interp*tpp > MATMUL_MIN): MXU matmuls.
      Conceptually the frame matrix ``F[a, j] = ext[a*decim + j]`` times a
      host-built window matrix ``G[j, b] = bank[p_b, t]`` at ``j = off_b +
      t`` gives all ``interp`` phase columns of output group ``a`` in one
      contraction — interp*tpp multiply-adds per output land on the MXU
      instead of interp*tpp separate VPU AXPYs.  Evaluated WITHOUT
      materializing F: split over the R row-blocks of G, ``y = sum_q
      rows[a+q, :] @ G[q*M:(q+1)*M]`` — R matmuls on shifted unit-stride
      views of the SAME (rows, M) reshape, so the input is read R times
      but the (A, R*M) frame concat (bigger than the input by ~R) is
      never written.  Measured 20% faster than the concat form at the
      WFM audio shape on v5e (exp/demod64.py, round 4c).
    - ``"unrolled"`` — interp*tpp shift-and-add AXPYs (best for small
      banks where the frame-matrix build would dominate).
    - ``"gather"`` — frame gather + einsum, kept as a debugging fallback.
    """

    UNROLL_LIMIT = 8192
    MATMUL_MIN = 256

    def __init__(
        self,
        interp: int,
        decim: int,
        taps: np.ndarray,
        dtype=jnp.complex64,
        method: str = "auto",
    ):
        self.interp = int(interp)
        self.decim = int(decim)
        self.dtype = dtype
        bank = build_polyphase_bank(self.interp, taps)
        self.taps_per_phase = bank.shape[1]
        self.bank = bank  # host numpy
        if method == "auto":
            work = self.interp * self.taps_per_phase
            method = "unrolled" if work <= self.MATMUL_MIN else "matmul"
        assert method in ("unrolled", "gather", "matmul")
        self.method = method
        if method == "matmul":
            # G[j, b] = bank[p_b, t] at j = off_b + t (zero elsewhere).
            L, M, tpp = self.interp, self.decim, self.taps_per_phase
            R = 1 + -(-(tpp - 1) // M) if tpp > 1 else 1
            G = np.zeros((R * M, L), np.float64)
            for b in range(L):
                p_b = (b * M) % L
                off_b = (b * M) // L
                G[off_b : off_b + tpp, b] = bank[p_b]
            self._G = G.astype(np.float32)
            self._R = R

    def init_state(self):
        return np.zeros((self.taps_per_phase - 1,), np.dtype(self.dtype))

    def out_len(self, n: int) -> int:
        assert n % self.decim == 0, (
            f"block length {n} must be a multiple of decim={self.decim}"
        )
        return (n * self.interp) // self.decim

    def __call__(self, state, x):
        n = x.shape[-1]
        n_out = self.out_len(n)
        L, M, tpp = self.interp, self.decim, self.taps_per_phase
        ext = jnp.concatenate(
            [jnp.broadcast_to(jnp.asarray(state), x.shape[:-1] + (tpp - 1,)), x.astype(self.dtype)],
            axis=-1,
        )
        if self.method == "matmul":
            A = n_out // L
            R = self._R
            rows = A + R - 1
            xp = jnp.pad(
                ext, [(0, 0)] * (ext.ndim - 1) + [(0, rows * M - ext.shape[-1])]
            )
            xr = xp.reshape(ext.shape[:-1] + (rows, M))
            from .fir import shifted_window_matmul

            # y[..., a, b] = sum_q rows[a+q, :] @ G[q*M:(q+1)*M, b] —
            # the frame-matrix contraction without materializing the
            # (A, R*M) concat (see class docstring).  bf16x3 passes:
            # TPU einsum DEFAULT does f32 as ONE bf16 pass (~-50 dB
            # contraction noise — audible in a resampled audio stream);
            # "high" holds it at ~-95 dB, below every demod SINAD floor
            # (exp/mmprec.py, round 4c).
            if jnp.iscomplexobj(ext):
                out = shifted_window_matmul(
                    (xr.real, xr.imag), (self._G,), A, precision="high"
                )
                y = jax.lax.complex(out[0][0], out[1][0])
            else:
                out = shifted_window_matmul((xr,), (self._G,), A,
                                            precision="high")
                y = out[0][0]
            y = y.reshape(ext.shape[:-1] + (n_out,)).astype(ext.dtype)
        elif self.method == "unrolled":
            A = n_out // L
            # Shared polyphase layout: x[a*M + s] = xt[s % M, a + s // M]
            # with one reshape+transpose; every tap is a unit-stride slice
            # (lane-strided slices are pathological on TPU).
            ext_len = ext.shape[-1]
            max_start = (M - 1) + (tpp - 1)  # max off_b + t
            q_max = max_start // M
            rows = max(-(-ext_len // M), A + q_max)
            xp = jnp.pad(
                ext, [(0, 0)] * (ext.ndim - 1) + [(0, rows * M - ext_len)]
            )
            xt = jnp.swapaxes(
                xp.reshape(ext.shape[:-1] + (rows, M)), -1, -2
            )  # (..., M, rows)
            cols = []
            for b in range(L):
                p_b = (b * M) % L
                off_b = (b * M) // L
                acc = None
                for t in range(tpp):
                    h = float(self.bank[p_b, t])
                    if h == 0.0:
                        continue
                    q, r = divmod(off_b + t, M)
                    seg = jax.lax.dynamic_slice_in_dim(
                        xt[..., r, :], q, A, axis=-1
                    )
                    term = h * seg
                    acc = term if acc is None else acc + term
                if acc is None:
                    acc = jnp.zeros(ext.shape[:-1] + (A,), ext.dtype)
                cols.append(acc)
            y = jnp.stack(cols, axis=-1).reshape(ext.shape[:-1] + (n_out,))
        else:
            k = np.arange(n_out, dtype=np.int64)
            phase = ((k * M) % L).astype(np.int32)
            offset = ((k * M) // L).astype(np.int32)
            t_idx = np.arange(tpp, dtype=np.int32)
            frames = ext[..., offset[:, None] + t_idx[None, :]]
            tap_rows = jnp.asarray(self.bank[phase])  # host gather (static)
            y = jnp.einsum("...kt,kt->...k", frames.real, tap_rows)
            if jnp.iscomplexobj(ext):
                yi = jnp.einsum("...kt,kt->...k", frames.imag, tap_rows)
                y = jax.lax.complex(y, yi)
            y = y.astype(ext.dtype) if jnp.iscomplexobj(ext) else y
        new_state = ext[..., n:]  # trailing tpp-1 samples (per channel)
        return new_state, y


class RationalResampler(StreamOp):
    """Arbitrary rate conversion with automatic staging.

    Planner (vs ``rational_resampler.h:120-165``): single-stage gcd-reduced
    polyphase when the MXU frame matrix stays narrow (one matmul replaces
    the whole cascade — measured 8x faster than predecim+polyphase for
    250k->48k, and the 9500-tap prototype is a *sharper* filter), else the
    largest integer pre-decimation ``d`` with ``in/d >= out`` integral
    (multistage `IntegerDecimator`) followed by the reduced polyphase.
    Prototype design per the reference: Nuttall lowpass at min(in,out)/2,
    10% transition, scaled by interp.
    """

    # Max frame-matrix width (decim + taps_per_phase) for a single-stage
    # polyphase plan; beyond this the frame matrix's HBM footprint exceeds
    # the cascade's cost.
    SINGLE_STAGE_MAX_W = 2048

    def __init__(
        self,
        in_samplerate: float,
        out_samplerate: float,
        dtype=jnp.complex64,
        bw: float | None = None,
        trans_bw: float | None = None,
    ):
        """``bw``/``trans_bw`` override the prototype passband edge and
        transition width (defaults: min(in,out)/2 and 10% of that).  Use
        them to fold an adjacent channel/audio lowpass into the resampler
        — the polyphase matmul's cost is nearly independent of filter
        length, so a combined filter is free (e.g. the WFM pipeline folds
        its 15 kHz audio LPF here and drops two 237-tap FIRs)."""
        self.in_samplerate = float(in_samplerate)
        self.out_samplerate = float(out_samplerate)
        self.dtype = dtype
        self._bw = bw
        self._trans = trans_bw

        int_sr = round(in_samplerate)
        out_sr = round(out_samplerate)

        # Largest integer pre-decimation that keeps the intermediate rate
        # integral and >= the output rate.
        d = int_sr // out_sr
        while d > 1 and int_sr % d != 0:
            d -= 1

        # Single-stage plan: no predecim if the polyphase frame matrix is
        # narrow enough for one matmul.  The planning-pass prototype is
        # cached: when this plan wins it is byte-identical (up to the
        # `interp` gain) to the construction-pass filter, which can be
        # thousands of taps of windowed-sinc design per VFO.
        plan_taps = None
        if d > 1 and int_sr != out_sr:
            g1 = math.gcd(int_sr, out_sr)
            L1, M1 = out_sr // g1, int_sr // g1
            if L1 > 1:
                bw1 = bw if bw is not None else min(in_samplerate, out_samplerate) / 2.0
                taps1 = tapsmod.low_pass(bw1, trans_bw or bw1 * 0.1, int_sr * L1)
                tpp1 = -(-len(taps1) // L1)
                if M1 + tpp1 <= self.SINGLE_STAGE_MAX_W:
                    d = 1
                    plan_taps = taps1
        mid_sr = int_sr // d if d > 1 else int_sr

        g = math.gcd(mid_sr, out_sr)
        interp = out_sr // g
        decim = mid_sr // g

        actual_out = mid_sr * interp / decim
        self.rate_error_pct = (
            abs((actual_out - out_samplerate) / out_samplerate) * 100.0
        )

        self.predecim = (
            IntegerDecimator(
                in_samplerate, d, dtype,
                out_bw=bw if bw is not None else 0.4 * out_samplerate,
            )
            if d > 1
            else None
        )
        self.interp = interp
        self.decim = decim
        if interp != decim:
            if plan_taps is not None:
                rtaps = plan_taps * np.float32(interp)
            else:
                tap_sr = mid_sr * interp
                pbw = bw if bw is not None else min(in_samplerate, out_samplerate) / 2.0
                rtaps = tapsmod.low_pass(pbw, trans_bw or pbw * 0.1, tap_sr) * np.float32(interp)
            self.resamp = PolyphaseResampler(interp, decim, rtaps, dtype)
        else:
            self.resamp = None

    def init_state(self):
        return (
            self.predecim.init_state() if self.predecim else (),
            self.resamp.init_state() if self.resamp else (),
        )

    def out_len(self, n: int) -> int:
        if self.predecim:
            n = self.predecim.out_len(n)
        if self.resamp:
            n = self.resamp.out_len(n)
        return n

    def block_multiple(self) -> int:
        """Smallest input block length quantum keeping all shapes static."""
        m = self.predecim.ratio if self.predecim else 1
        if self.resamp:
            m *= self.resamp.decim
        return m

    def __call__(self, state, x):
        st_d, st_r = state
        if self.predecim:
            st_d, x = self.predecim(st_d, x)
        if self.resamp:
            st_r, x = self.resamp(st_r, x)
        return (st_d, st_r), x
