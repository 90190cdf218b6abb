"""Oversampled polyphase filter-bank (PFB) channelizer.

The many-VFO front end whose heavy stages are INDEPENDENT of channel
count: one shared M-bin analysis filter bank over the wideband input,
then per-channel work only at the (already decimated) bin rate.

    ext = [tail ++ x]                                (streaming history)
    z_t[r]  = sum_q h[qM + r] * ext[tD + qM + r]     (polyphase fold)
    Y_t     = FFT_M(z_t) * twiddle[t mod V]          (all M bins at once)
    y_c     = Y[:, bin_c]                            (per-channel gather)
              -> residual rotator (delta_c = f_c - bin_c*fs/M, at fb)
              -> rational resample fb -> if_rate

with D the hop (bin rate fb = fs/D), V = M/D the oversample factor, and
h an M*tpp-tap lowpass prototype whose passband covers the channel
bandwidth PLUS the worst-case residual fs/(2M) (nearest-bin tuning).
The final channel selectivity comes from the fb->if_rate resampler's
own anti-alias lowpass, exactly like the reference's RxVFO
(xlator -> RationalResampler, ``channel/rx_vfo.h:89-100``) — the PFB
replaces only the reference's per-VFO full-rate rotator+decimator with
a shared transform, the classic radio-astronomy/SDR many-channel
design.

Cost per input sample: ~2*tpp*V (fold) + 5*log2(M)*V (FFT) shared,
plus O(C * if_rate/fs) per channel — vs the per-channel alias-fold
chain whose fold costs ~8*C*(nfft/valid) per sample.  The crossover
favors the PFB from a few tens of channels.

Retuning: bin indices live in the STATE pytree (gather indices) and the
residual rotator's tables are `MultiVfoMixer` state, so `retune_state`
swaps both without retracing — same contract as `FftDecimatorChain`.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..graph.block import StreamOp
from ..kernels import taps as tapsmod
from ..kernels.resample import RationalResampler
from .channelizer import MultiVfoMixer

_TWO_PI = 2.0 * np.pi


def plan_pfb(fs: float, if_rate: float, att_taps_factor: float = 4.0):
    """Pick (M, D, tpp) for an oversampled analysis bank.

    Constraints: D | M; bin rate fb = fs/D rational to if_rate (small
    polyphase factors); prototype passband p = if_rate/2 + fs/(2M) and
    stopband fb/2 leave a positive transition band; tpp sized so the
    prototype spans ~att_taps_factor * fs / transition taps.
    Returns the plan minimizing modeled shared work per input sample.
    """
    from fractions import Fraction

    best = None
    for M in (16, 32, 64, 128, 256, 512, 1024):
        for V in (2, 4, 8, 16):
            if M % V:
                continue
            D = M // V
            fb = fs / D
            frac = Fraction(fb / if_rate).limit_denominator(1 << 12)
            if abs(float(frac) - fb / if_rate) > 1e-9 or frac.numerator > 512:
                continue
            p_pass = 0.5 * if_rate + fs / (2.0 * M)
            trans = fb / 2.0 - p_pass
            if trans <= if_rate * 0.05:
                continue
            ntaps = att_taps_factor * fs / trans
            tpp = max(4, int(np.ceil(ntaps / M)))
            # shared flops per input sample: fold + FFT
            cost = 2.0 * tpp * V + 5.0 * np.log2(M) * V
            if best is None or cost < best[0]:
                best = (cost, M, D, tpp)
    if best is None:
        raise ValueError(f"no PFB plan for fs={fs}, if_rate={if_rate}")
    return best[1], best[2], best[3]


class PfbChannelizer(StreamOp):
    """C VFOs at arbitrary offsets via a shared M-bin filter bank."""

    def __init__(self, offsets_hz, in_samplerate: float, if_rate: float,
                 block_len: int, bins: int | None = None,
                 decim: int | None = None, tpp: int | None = None):
        fs = float(in_samplerate)
        self.fs = fs
        self.if_rate = float(if_rate)
        offsets = np.asarray(offsets_hz, np.float64)
        self.offsets = offsets
        self.n_channels = len(offsets)
        if bins is None or decim is None or tpp is None:
            bins, decim, tpp = plan_pfb(fs, if_rate)
        M, D = int(bins), int(decim)
        assert M % D == 0, (M, D)
        self.M, self.D, self.V, self.tpp = M, D, M // D, tpp
        self.fb = fs / D
        self.block_len = int(block_len)
        # frames per block must be whole AND a multiple of the twiddle
        # period V (i.e. block % M == 0) so per-block frame indices stay
        # congruent with the global stream
        assert self.block_len % M == 0, (self.block_len, M)
        L = M * tpp
        self.L = L

        # prototype lowpass at the input rate; passband must cover the
        # channel band shifted by the worst-case nearest-bin residual
        p_pass = 0.5 * self.if_rate + fs / (2.0 * M)
        trans = self.fb / 2.0 - p_pass
        h = tapsmod.low_pass(p_pass, trans, fs, odd_tap_count=False)
        hp = np.zeros(L, np.float64)
        # unit passband gain: a tone at a bin center comes out at its
        # input amplitude (sum of prototype taps = 1)
        hp[: min(len(h), L)] = h[:L] / np.sum(h[:L])
        self._h2 = np.ascontiguousarray(
            hp.reshape(tpp, M)
        ).astype(np.float32)  # h2[q, r] = h[q*M + r]

        # frame twiddle e^{-2pi i m t D / M}, period V in t
        m = np.arange(M)
        v = np.arange(self.V)[:, None]
        self._tw = np.exp(-2j * np.pi * m[None, :] * v * D / M).astype(
            np.complex64
        )

        self._assign(offsets)
        F = self.block_len // D
        self.resamp = RationalResampler(self.fb, self.if_rate)
        assert F % self.resamp.block_multiple() == 0, (
            f"block {block_len}: {F} PFB frames not a multiple of the "
            f"fb->if resampler quantum {self.resamp.block_multiple()}"
        )

    def _assign(self, offsets):
        """Nearest bin + residual for each channel."""
        M, fs = self.M, self.fs
        bins = np.round(offsets * M / fs).astype(np.int64)
        delta = offsets - bins * fs / M  # |delta| <= fs/(2M)
        self._bins = np.mod(bins, M).astype(np.int32)
        self._delta = delta
        # mixer brings +delta down to baseband at the bin rate
        self.rot = MultiVfoMixer(
            [-d for d in delta], self.fb, self.block_len // self.D
        )

    @staticmethod
    def block_multiple_for(fs, if_rate) -> int:
        M, D, _ = plan_pfb(fs, if_rate)
        r = RationalResampler(fs / D, if_rate)
        a, b = M, D * r.block_multiple()
        return a * b // int(np.gcd(a, b))

    def init_state(self):
        return {
            "tail": np.zeros(self.L - self.D, np.complex64),
            "bins": self._bins.copy(),
            "rot": self.rot.init_state(),
            "resamp": self.resamp.init_state(),
        }

    def retune_state(self, state, offsets_hz) -> dict:
        """Swap bin indices + residual-rotator tables; keep histories."""
        offsets = np.asarray(offsets_hz, np.float64)
        assert offsets.shape == self.offsets.shape
        old_rot = state["rot"]
        self._assign(offsets)
        self.offsets = offsets
        new_rot = self.rot.init_state()
        new_rot["phase"] = old_rot["phase"]  # phase continuity per channel
        return {
            "tail": state["tail"],
            "bins": self._bins.copy(),
            "rot": new_rot,
            "resamp": state["resamp"],
        }

    def out_len(self, n: int) -> int:
        return self.resamp.out_len(n // self.D)

    def __call__(self, state, x):
        n = x.shape[-1]
        assert n % self.block_len == 0, (n, self.block_len)
        K = n // self.block_len
        M, D, V, tpp = self.M, self.D, self.V, self.tpp
        x = x.astype(jnp.complex64)
        ext = jnp.concatenate([jnp.asarray(state["tail"]), x])
        new_tail = ext[n:]
        F = n // D
        # polyphase fold via unit-stride row slices: position
        # t*D + q*M + r with r = s*D + d  ->  rows[t + q*V + s, d]
        rows_n = F + tpp * V  # frames + max shift (q*V + s <= tpp*V - 1) + 1
        ext_p = jnp.pad(ext, (0, rows_n * D - ext.shape[-1]))
        rows = ext_p.reshape(rows_n, D)
        h2 = self._h2
        cols = []
        for s in range(V):
            acc = None
            hseg = h2[:, s * D:(s + 1) * D]  # (tpp, D)
            for q in range(tpp):
                seg = jax.lax.dynamic_slice_in_dim(
                    rows, q * V + s, F, axis=0
                )
                term = seg * jnp.asarray(hseg[q])
                acc = term if acc is None else acc + term
            cols.append(acc)
        z = jnp.concatenate(cols, axis=1)  # (F, M)
        Y = jnp.fft.fft(z)  # (F, M)
        # frame twiddle (cycles with period V); F % V == 0 by block quantum
        tw = jnp.asarray(self._tw)
        Y = (Y.reshape(F // V, V, M) * tw[None, :, :]).reshape(F, M)
        # per-channel bin gather -> (C, F) at the bin rate
        y = jnp.take(Y, jnp.asarray(state["bins"]), axis=1).T
        if K == 1:
            st_rot, y = self.rot(state["rot"], y)
        else:
            st_rot, y = self.rot.rotate_blocks(state["rot"], y, K)
        st_rs, y = self.resamp(state["resamp"], y)
        return {
            "tail": new_tail,
            "bins": state["bins"],
            "rot": st_rot,
            "resamp": st_rs,
        }, y
