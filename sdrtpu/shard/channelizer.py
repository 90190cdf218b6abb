"""Multi-VFO channelizer: batched DDC over a channel axis.

The reference fans IQ out to N ``RxVFO`` threads via a Splitter memcpy
(``core/src/dsp/routing/splitter.h:46-61``, ``iq_frontend.cpp:140-160``);
each VFO runs rotator -> RationalResampler -> optional lowpass on its own
thread (``channel/rx_vfo.h:89-100``).  Here the N channels are one more
array axis: every kernel already operates on ``(..., n)``, so the
channelizer is the same program with shape ``(C, n)`` — and the channel
axis is the natural sharding axis across TPU chips (see `mesh.py`).

Two execution paths:

- **fused** (default on TPU): mixing and the first decimation stage run in
  the Pallas kernel (`kernels/pallas_channelizer.py`) — one HBM read/write
  per tile with the FIR as an MXU Toeplitz matmul; remaining stages and
  the polyphase resampler run in XLA on the already-decimated data.
  Measured ~8x faster than the unfused path (968 vs ~120 Msps input).
- **unfused** (CPU/tests/fallback): `MultiVfoMixer` + `RationalResampler`.

Phase-ramp precision: per-channel wrapped angle tables are precomputed on
the host in float64 (same hierarchical scheme as `kernels.mixer`), carried
in the *state* pytree rather than closed over — under sharding,
per-channel constants must travel as sharded arrays, not baked into the
(single, shared) program.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..graph.block import StreamOp
from ..kernels.fir import Fir, correlate_valid_bank
from ..kernels.pallas_channelizer import FusedChannelizerStage
from ..kernels.resample import RationalResampler
from ..kernels import taps as tapsmod

_TWO_PI = 2.0 * np.pi
_FINE = 1024


class MultiVfoMixer(StreamOp):
    """C-channel frequency translation: y[c] = x * exp(i*omega_c*n).

    To bring channels at +f_c down to baseband pass ``-f_c`` offsets
    (``RxVFO`` convention).  The block length is fixed at construction so
    the per-channel wrapped-phase tables live in the state pytree with
    static shapes.
    """

    def __init__(self, offsets_hz, samplerate: float, block_len: int):
        offsets = np.asarray(offsets_hz, np.float64)
        self.n_channels = len(offsets)
        self.samplerate = float(samplerate)
        self.block_len = int(block_len)
        omega = _TWO_PI * offsets / samplerate  # (C,) float64

        n = self.block_len
        fine = min(_FINE, n)
        n_coarse = -(-n // fine)
        k_fine = np.arange(fine, dtype=np.float64)
        k_coarse = np.arange(n_coarse, dtype=np.float64) * fine
        self.offsets = offsets
        self._fine_t = np.mod(omega[:, None] * k_fine, _TWO_PI).astype(np.float32)
        self._coarse_t = np.mod(omega[:, None] * k_coarse, _TWO_PI).astype(np.float32)
        self._delta = np.mod(omega * n, _TWO_PI).astype(np.float32)
        self._fine = fine

    def init_state(self):
        return {
            "phase": np.zeros(self.n_channels, np.float32),
            "coarse": self._coarse_t,
            "fine": self._fine_t,
            "delta": self._delta,
        }

    def retune_state(self, state, offsets_hz) -> dict:
        """Swap the offset tables WITHOUT retracing (they live in state).

        The carried phase is preserved — the reference's ``RxVFO::
        setOffset`` likewise only changes the rotator increment
        (``rx_vfo.h:72-77``).  The mixer's own host tables are updated
        too, so ``init_state()`` after a retune reflects the new offsets.
        """
        fresh = MultiVfoMixer(offsets_hz, self.samplerate, self.block_len)
        assert fresh.n_channels == self.n_channels
        self.offsets = fresh.offsets
        self._fine_t = fresh._fine_t
        self._coarse_t = fresh._coarse_t
        self._delta = fresh._delta
        return {
            "phase": state["phase"],
            "coarse": fresh._coarse_t,
            "fine": fresh._fine_t,
            "delta": fresh._delta,
        }

    def __call__(self, state, x):
        n = x.shape[-1]
        assert n == self.block_len, (
            f"MultiVfoMixer built for block_len={self.block_len}, got {n}"
        )
        coarse = jnp.asarray(state["coarse"])  # (C, nc)
        fine = jnp.asarray(state["fine"])  # (C, K)
        phase = jnp.asarray(state["phase"])  # (C,)
        # channel count from the state tables (not self.n_channels): under
        # shard_map the per-shard view carries C/n_shards rows
        angles = (coarse[:, :, None] + fine[:, None, :]).reshape(
            coarse.shape[0], -1
        )[:, :n]
        angles = angles + phase[:, None]
        rot = jax.lax.complex(jnp.cos(angles), jnp.sin(angles))
        y = x * rot if x.ndim > 1 else x[None, :] * rot
        new_phase = jnp.mod(
            phase + jnp.asarray(state["delta"]), np.float32(_TWO_PI)
        )
        return {**state, "phase": new_phase}, y

    def rotate_blocks(self, state, y, K: int):
        """Rotate K consecutive blocks ``y: (C, K*block_len)`` in ONE pass.

        The per-block recurrence ``phase += delta`` unrolls in closed form:
        block j starts at phase + j*delta (mod 2pi), so the whole window
        rotates with a broadcast — no scan.  j*delta is accumulated
        hierarchically (j = q*Q + r) so float32 stays within ~1e-5 rad of
        the sequential mod chain even at K = 256.
        """
        n = y.shape[-1]
        assert n == K * self.block_len, (n, K, self.block_len)
        coarse = jnp.asarray(state["coarse"])
        fine = jnp.asarray(state["fine"])
        phase = jnp.asarray(state["phase"])  # (C,)
        delta = jnp.asarray(state["delta"])  # (C,)
        C = coarse.shape[0]
        angles = (coarse[:, :, None] + fine[:, None, :]).reshape(C, -1)[
            :, : self.block_len
        ]
        Q = max(1, int(np.sqrt(K)))
        deltaQ = jnp.mod(delta * np.float32(Q), np.float32(_TWO_PI))
        q = jnp.arange(-(-K // Q), dtype=jnp.float32)
        r = jnp.arange(Q, dtype=jnp.float32)
        # phases[c, j] for j = q*Q + r, trimmed to K
        ph = jnp.mod(
            phase[:, None, None]
            + deltaQ[:, None, None] * q[None, :, None]
            + delta[:, None, None] * r[None, None, :],
            np.float32(_TWO_PI),
        ).reshape(C, -1)[:, :K]
        ang = angles[:, None, :] + ph[:, :, None]  # (C, K, n_blk)
        rot = jax.lax.complex(jnp.cos(ang), jnp.sin(ang))
        out = (y.reshape(C, K, self.block_len) * rot).reshape(C, n)
        # carry phase past block K-1 (hierarchical value + one delta, so
        # the dispatch-to-dispatch carry keeps the same f32 error class
        # as the sequential per-block chain)
        new_phase = jnp.mod(ph[:, K - 1] + delta, np.float32(_TWO_PI))
        return {**state, "phase": new_phase}, out


class ModulatedDecimatorChain(StreamOp):
    """Fused mix + multistage decimation in pure XLA (modulated taps).

    Algebraic identity, first stage: with mixer phase
    ``w'_c = -2*pi*f_c/fs`` and a decimate-by-M FIR ``h`` of length T,

        out[c, i] = sum_t X[s + iM + t - (T-1)] * e^{j w'_c (s+iM+t-(T-1))} * h[t]
                  = e^{j w'_c (s + iM - (T-1))} * sum_t X[...] * (h[t] e^{j w'_c t})

    so the per-channel full-rate mix folds into per-channel complex taps
    ``h_c[t] = h[t] e^{j w'_c t}`` applied to the SHARED input (one
    `correlate_valid_bank` pass).  The residual rotator then *commutes
    through every later decimation stage* by the same identity with
    per-sample phase ``w'_c * prod(M_prev)`` — each stage k gets taps
    ``h_k[t] e^{j w'_c R_k t}`` (R_k = decimation product before it) and
    contributes ``-w'_c R_k (T_k - 1)`` to the constant phase — leaving a
    single rotator at the FINAL decimated rate (e.g. 250 kHz instead of
    10 MHz: a 40x cheaper mixer for the WBFM 8-VFO pipeline).  Output
    equals MultiVfoMixer -> IntegerDecimator up to float reassociation
    (asserted in tests/test_pallas_channelizer.py).

    The carried stage-1 tail is the shared wideband input
    (C-independent); later-stage tails are per-channel at their (already
    decimated) rates.
    """

    def __init__(self, offsets_hz, samplerate, stages, block_len):
        """``stages``: list of (taps, decimation) pairs, input rate order."""
        offsets = np.asarray(offsets_hz, np.float64)  # channel centers f_c
        self.n_channels = len(offsets)
        omega_p = -_TWO_PI * offsets / float(samplerate)  # (C,) mixer rate
        self.stage_plan: list[tuple[np.ndarray, int, int]] = []
        self._live: list[list[int]] = []
        phase0 = np.zeros(self.n_channels, np.float64)
        rate_mult = 1  # product of decimations applied so far
        n = int(block_len)
        for taps, M in stages:
            taps = np.asarray(taps, np.float64)
            T = int(taps.shape[0])
            M = int(M)
            t_idx = np.arange(T, dtype=np.float64)
            mod = taps[None, :] * np.exp(
                1j * np.mod(omega_p[:, None] * rate_mult * t_idx, _TWO_PI)
            )
            self.stage_plan.append((mod.astype(np.complex64), M, T))
            # live (nonzero) tap columns are offset-invariant (|h e^{jwt}|
            # = |h|), so the shift-add unroll's zero-skip stays static
            # even with the taps living in the state pytree
            self._live.append([t for t in range(T) if taps[t] != 0.0])
            phase0 -= omega_p * rate_mult * (T - 1)
            rate_mult *= M
            assert n % M == 0, (n, M)
            n //= M
        self.ratio = rate_mult
        self.block_len = int(block_len)
        self.rot = MultiVfoMixer(-offsets, samplerate / rate_mult, n)
        self._phase0 = np.mod(phase0, _TWO_PI).astype(np.float32)

    def init_state(self):
        rot = self.rot.init_state()
        rot["phase"] = self._phase0.copy()
        tails = [np.zeros(self.stage_plan[0][2] - 1, np.complex64)]
        for _, _, T in self.stage_plan[1:]:
            tails.append(np.zeros((self.n_channels, T - 1), np.complex64))
        # modulated taps live in the STATE pytree (like the FFT front's
        # ``hf`` table) so an offset retune is a table swap, not a retrace
        return {
            "tails": tuple(tails),
            "taps": tuple(mod for mod, _, _ in self.stage_plan),
            "rot": rot,
        }

    def retune_state(self, state, offsets_hz, samplerate: float,
                     stages) -> dict:
        """Retune WITHOUT retracing: swap taps + rotator tables.

        Same contract as `FftDecimatorChain.retune_state`: every
        offset-dependent constant (modulated stage taps, residual-rotator
        tables and group-delay phase) is state; carried tails are
        offset-independent histories and are preserved.  Each channel's
        ACCUMULATED rotator phase is carried over (minus the old
        group-delay constant, plus the new one), so channels whose offset
        did not change see no phase step — ``RxVFO::setOffset`` semantics
        (``rx_vfo.h:72-77``).  Host constants are adopted from the fresh
        plan, keeping ``init_state()`` valid after the retune."""
        fresh = ModulatedDecimatorChain(
            offsets_hz, samplerate, stages, self.block_len
        )
        assert fresh.ratio == self.ratio and len(fresh.stage_plan) == len(
            self.stage_plan
        ), "retune changed the stage plan; rebuild the chain instead"
        new = fresh.init_state()
        new["tails"] = state["tails"]
        new["rot"]["phase"] = np.mod(
            np.asarray(state["rot"]["phase"], np.float32)
            - self._phase0 + fresh._phase0,
            np.float32(_TWO_PI),
        )
        self.stage_plan = fresh.stage_plan
        self._live = fresh._live
        self._phase0 = fresh._phase0
        self.rot = fresh.rot
        return new

    def out_len(self, n: int) -> int:
        return n // self.ratio

    def __call__(self, state, x):
        y = x.astype(jnp.complex64)
        new_tails = []
        for (_, M, T), tail, taps_mod, live in zip(
            self.stage_plan, state["tails"], state["taps"], self._live
        ):
            n = y.shape[-1]
            ext = jnp.concatenate([jnp.asarray(tail), y], axis=-1)
            new_tails.append(ext[..., n:])
            y = correlate_valid_bank(
                ext, jnp.asarray(taps_mod), stride=M, live=live
            )  # (C, n/M)
        st_rot, y = self.rot(state["rot"], y)
        return {
            "tails": tuple(new_tails),
            "taps": state["taps"],
            "rot": st_rot,
        }, y


def ModulatedDecimatorStage(offsets_hz, samplerate, taps, decimation, block_len):
    """Single-stage convenience wrapper around `ModulatedDecimatorChain`."""
    return ModulatedDecimatorChain(
        offsets_hz, samplerate, [(taps, decimation)], block_len
    )


def _cascade_equivalent_taps(stages) -> np.ndarray:
    """Collapse a decimating-FIR cascade into one full-rate filter.

    By the noble identity, (filter h1, decimate M1, filter h2, decimate M2)
    equals (filter h1 * upsample_M1(h2), decimate M1*M2).  Float64 host math.
    """
    h = np.asarray(stages[0][0], np.float64)
    rate_mult = int(stages[0][1])
    for taps, M in stages[1:]:
        taps = np.asarray(taps, np.float64)
        up = np.zeros((len(taps) - 1) * rate_mult + 1, np.float64)
        up[::rate_mult] = taps
        h = np.convolve(h, up)
        rate_mult *= int(M)
    return h


def _plan_fft_chunks(
    block_len: int, R: int, t_eq: int, n_channels: int = 1
) -> tuple[int, int]:
    """Pick (valid, nfft) for chunked overlap-save decimation.

    Constraints: valid divides block_len, valid % R == 0, nfft % R == 0,
    nfft >= valid + t_eq - 1, nfft FFT-friendly (R * 2^a * 5^b).

    The cost model covers the whole chunked pipeline, not just the FFTs —
    with P = block_len/valid chunks per block:

    - shared FFTs: ~5 * P * nfft * log2(nfft) flops;
    - the per-channel alias fold is a [batch=nif, M=P, K=R, N=C] matmul
      (C*P*nfft MACs): its MXU efficiency collapses when P << 128 (the
      systolic array pads M to the tile), modeled as a 128/min(P,128)
      multiplier;
    - the folded filter table is (C, nfft) complex64 read once per block:
      at ~25 flop-equivalents per HBM byte, 200 * C * nfft.

    Fold terms dominate for many channels: the 64-VFO 50 Msps plan moves
    from (valid=250000, nfft=256000, P=10 — a 131 MB table and an M=10
    matmul) to small chunks with P >= 128, ~4x faster end to end.
    """
    nice = sorted(
        R * (2 ** a) * (5 ** b)
        for a in range(1, 28)
        for b in range(0, 7)
        if R * (2 ** a) * (5 ** b) <= 2 ** 24
    )
    C = max(1, int(n_channels))
    best = None
    v = R
    while v <= block_len:
        if block_len % v == 0:
            need = v + t_eq - 1
            for nfft in nice:
                if nfft >= need:
                    P = block_len // v
                    fft = 5.0 * P * nfft * np.log2(nfft)
                    fold = 8.0 * C * P * nfft * (128.0 / min(P, 128))
                    table = 200.0 * C * nfft
                    cost = fft + fold + table
                    if best is None or cost < best[0]:
                        best = (cost, v, nfft)
                    break
        v += R
    if best is None:
        raise ValueError(
            f"no FFT chunk plan for block_len={block_len}, R={R}, T={t_eq}"
        )
    return best[1], best[2]


class FftDecimatorChain(StreamOp):
    """Fused mix + decimate in the frequency domain (overlap-save).

    Same math as `ModulatedDecimatorChain` — per-channel modulated taps
    applied to the shared wideband input, single residual rotator at the
    final decimated rate — but the filtering+decimation runs as batched
    FFTs instead of a tap-unrolled shift-and-add:

        ext = [tail(Tpad-1) ++ x]  ->  P overlapping chunks of nfft
        X = fft(chunks)                                  (shared, P FFTs)
        Y_c = X * conj-free FFT(reversed modulated taps) (pointwise)
        fold: reshape (R, nfft/R) sum / R                (freq-domain
                                                          decimation by R)
        y_c = ifft(fold)[(Tpad-1)/R :]                   (small IFFTs)

    Cost per input sample is O(log nfft) independent of filter length, so
    the cascade is collapsed into ONE equivalent full-rate filter
    (`_cascade_equivalent_taps`) and zero-padded to the chunk overlap —
    a *sharper* channel filter at lower cost than the time-domain path.
    Output matches `ModulatedDecimatorChain` on the same stage plan to
    float tolerance (verified in tests/test_pallas_channelizer.py).

    Replaces the reference's per-VFO rotator + PowerDecimator cascade
    (``rx_vfo.h:89-100``, ``power_decimator.h:51-67``) at
    O(C * n log nfft / nfft-efficiency) instead of O(C * n * T).
    """

    def __init__(self, offsets_hz, samplerate, stages, block_len,
                 skip_rotator=False,
                 sparse_thresh_db: float | None = None):
        offsets = np.asarray(offsets_hz, np.float64)
        self.n_channels = len(offsets)
        omega_p = -_TWO_PI * offsets / float(samplerate)  # (C,) mixer rate
        h_eq = _cascade_equivalent_taps(stages)
        t_eq = len(h_eq)
        R = 1
        for _, M in stages:
            R *= int(M)
        self.ratio = R
        n = int(block_len)
        assert n % R == 0, (n, R)
        self.block_len = n
        valid, nfft = _plan_fft_chunks(n, R, t_eq, self.n_channels)
        self.valid, self.nfft = valid, nfft
        self.tpad = nfft - valid + 1
        self.n_chunks = n // valid
        self.nif = nfft // R
        # Prepend zeros so output positions match the cascade exactly
        # (window start = block_start - (t_eq - 1)); then modulate by the
        # per-channel mixer ramp and take the correlation spectrum.
        h_pad = np.zeros(self.tpad, np.float64)
        h_pad[self.tpad - t_eq:] = h_eq
        t_idx = np.arange(self.tpad, dtype=np.float64)
        hm = h_pad[None, :] * np.exp(
            1j * np.mod(omega_p[:, None] * t_idx, _TWO_PI)
        )  # (C, Tpad)
        hf = np.fft.fft(hm[:, ::-1], nfft, axis=-1)  # (C, nfft)
        # Fold layout precomputed on host: (C, R, nif)
        self._hf_folded = np.ascontiguousarray(
            hf.reshape(self.n_channels, R, self.nif)
        ).astype(np.complex64)
        # Sparse fold (opt-in): each channel's filter spectrum H(f - f_c)
        # is a narrowband lowpass shifted to f_c — of the R alias rows,
        # only the few crossing its pass/transition band carry energy.
        # Dropping rows whose peak is < sparse_thresh_db of the global
        # peak changes the output by less than the filter's design
        # stopband while cutting the fold's FLOPs by ~R/Rk (40 -> 9 for
        # the WBFM 8-VFO plan).  Measured on TPU v5e this LOSES to the
        # dense einsum (~25% slower): XLA lowers the row gather to a
        # memory-bound general gather whose materialized (P, C, Rk, nif)
        # intermediate outweighs the dense fold's single (P, R, nif)
        # read.  Kept opt-in for backends with cheaper gathers; default
        # (None) is the dense fold.
        self._sparse_thresh = sparse_thresh_db
        self._sparse = False
        if sparse_thresh_db is not None:
            rowmax = np.abs(self._hf_folded).max(axis=2)  # (C, R)
            thresh = rowmax.max() * 10.0 ** (sparse_thresh_db / 20.0)
            keep = rowmax > thresh  # (C, R) bool
            rk = int(keep.sum(axis=1).max())
            self._sparse = 0 < rk <= R // 2
        if self._sparse:
            self.rk = rk
            idx = np.zeros((self.n_channels, rk), np.int32)
            hs = np.zeros((self.n_channels, rk, self.nif), np.complex64)
            for c in range(self.n_channels):
                rows = np.flatnonzero(keep[c])
                idx[c, : len(rows)] = rows  # padding rows point at 0 with
                hs[c, : len(rows)] = self._hf_folded[c, rows]  # zero taps
            self._fold_idx = idx
            self._hf_sparse = hs
            del self._hf_folded  # dense table unused in sparse mode
        else:
            # Polyphase-split forward transform (dense default): instead
            # of one nfft-point FFT per chunk, split n = q*R + s
            # (Cooley-Tukey) so only length-nif FFTs run on device:
            #     F_s[p, k] = FFT_nif(chunk_p[qR + s] over q)
            #     X[p, r*nif+k] = sum_s e^{-2pi i s(r*nif+k)/nfft} F_s[p,k]
            # and the alias fold absorbs the outer stage into the table:
            #     S[c,p,k] = sum_s F[p,s,k] * G[c,s,k],
            #     G[c,s,k] = (1/R) e^{-2pi i s k/nfft} DFT_R(hf[c,:,k])[s].
            # Same einsum shape as the direct fold; the length-nif FFT
            # batch runs ~8.6x faster than the nfft-point batch on v5e
            # (measured 128 vs 14.8 Gpts/s at the 64-VFO plan,
            # docs/PERF.md round 4).  The sparse opt-in path keeps the
            # direct nfft FFT (its gather needs the full X), so G is not
            # built there.
            s_idx = np.arange(R, dtype=np.float64)
            k_idx = np.arange(self.nif, dtype=np.float64)
            tw = np.exp(-2j * np.pi * np.outer(s_idx, k_idx) / nfft)
            G = np.fft.fft(
                hf.reshape(self.n_channels, R, self.nif), axis=1
            )
            self._g_folded = np.ascontiguousarray(
                G * tw[None, :, :] / R
            ).astype(np.complex64)
        # Pallas one-pass chunk builder: replaces the XLA chunk concat +
        # the FFT's input transpose copy with a single read+write kernel.
        # Plan-size gated from measurement (docs/PERF.md round 4): WINS
        # at large alias counts (64-VFO, R=200: 4719 -> 5182 Msps; the
        # (100, R) tiles amortize the grid) and LOSES at small ones
        # (8-VFO, R=40: 5476 -> 3919 — 1000 tiny grid steps/window), so
        # auto-on only for R >= 128 on TPU devices.  SDRTPU_PALLAS_CHUNKS
        # = "1"/"0" force-enables/disables.
        import os as _os

        from ..kernels.pallas_chunks import choose_group, chunk_poly_supported

        # Small-R plans group several chunks per grid step so the tile
        # amortizes the grid (kernels/pallas_chunks.py `choose_group`).
        # Round-4c measurement: grouping removes the 8-VFO plan's grid
        # overhead but its R=40 lane padding still loses ~30% to XLA, so
        # the auto gate stays R >= 128 (see the kernel docstring).
        self._pallas_group = choose_group(self.n_chunks, valid, R, self.nif)
        _env = _os.environ.get("SDRTPU_PALLAS_CHUNKS")
        if _env == "1":
            want_pallas = True
        elif _env == "0":
            want_pallas = False
        else:
            try:
                on_tpu = "tpu" in jax.devices()[0].device_kind.lower()
            except Exception:  # pragma: no cover - backend init failures
                on_tpu = False
            want_pallas = on_tpu and R >= 128
        self._pallas_chunks = want_pallas and chunk_poly_supported(
            valid, R, self.nif
        )
        self.rot = MultiVfoMixer(-offsets, samplerate / R, n // R)
        # The taps are modulated over the PADDED index, adding a constant
        # e^{j w' (tpad - t_eq)} that the rotator phase must cancel:
        # phase0 = -w'(tpad-1) = -w'(t_eq-1) - w'(tpad - t_eq).
        self._phase0 = np.mod(-omega_p * (self.tpad - 1), _TWO_PI).astype(
            np.float32
        )
        # skip_rotator: emit the IF rows WITHOUT the residual derotation.
        # An FM discriminator consumer is rotation-transparent — the
        # residual carrier adds only the constant `residual_omega` to
        # each product sample (constant phases like phase0 cancel in
        # y[n]*conj(y[n-1]) entirely) — so it can compensate with one
        # per-channel constant multiply instead of the per-sample
        # rotator (round-5 analysis).  NOT valid for consumers that
        # project to real (SSB/CW) or mix further.
        self.skip_rotator = bool(skip_rotator)
        self.residual_omega = np.mod(
            -_TWO_PI * offsets * R / float(samplerate), _TWO_PI
        ).astype(np.float32)

    def init_state(self):
        rot = self.rot.init_state()
        rot["phase"] = self._phase0.copy()
        st = {
            "tail": np.zeros(self.tpad - 1, np.complex64),
            "rot": rot,
        }
        if self._sparse:
            st["hf"] = self._hf_sparse  # (C, Rk, nif)
            st["fold_idx"] = self._fold_idx  # (C, Rk) int32
        else:
            st["hf"] = self._g_folded  # (C, R, nif) twiddle-folded table
        return st

    def retune_state(self, state, offsets_hz, samplerate: float,
                     stages) -> dict:
        """Retune WITHOUT retracing: swap the offset-dependent tables.

        Every per-offset constant of this chain — the modulated filter
        spectra ``hf`` and the residual rotator's phase tables — lives in
        the STATE pytree, not in the traced program, so retuning is a
        host-side rebuild of those tables (milliseconds) + a state swap.
        The carried input tail is offset-independent (it is the shared
        wideband history) and is preserved, exactly like the reference's
        live ``tempStop -> mutate -> tempStart`` reconfiguration keeps
        FIR histories (``rational_resampler.h:54-70``).
        """
        fresh = FftDecimatorChain(
            offsets_hz, samplerate, stages, self.block_len,
            skip_rotator=self.skip_rotator,
            sparse_thresh_db=self._sparse_thresh,
        )
        assert fresh.nfft == self.nfft and fresh.ratio == self.ratio, (
            "retune changed the FFT plan; rebuild the chain instead"
        )
        if fresh._sparse != self._sparse or (
            self._sparse and fresh.rk != self.rk
        ):
            # the sparse row set depends on the offsets; a different live
            # row count changes the state shapes (and thus the program)
            raise ValueError(
                "retune changed the sparse-fold layout; rebuild the chain"
            )
        new = fresh.init_state()
        new["tail"] = state["tail"]
        # carry each channel's ACCUMULATED rotator phase (minus old
        # group-delay constant, plus new): channels whose offset did not
        # change see no phase step (RxVFO::setOffset semantics)
        new["rot"]["phase"] = np.mod(
            np.asarray(state["rot"]["phase"], np.float32)
            - self._phase0 + fresh._phase0,
            np.float32(_TWO_PI),
        )
        # adopt the fresh host tables so init_state() is valid post-retune
        for attr in ("_hf_folded", "_g_folded", "_hf_sparse", "_fold_idx"):
            if hasattr(fresh, attr):
                setattr(self, attr, getattr(fresh, attr))
        self._phase0 = fresh._phase0
        self.rot = fresh.rot
        self.residual_omega = fresh.residual_omega
        return new

    def out_len(self, n: int) -> int:
        return n // self.ratio

    def chunk_matrix(self, ext, P: int):
        """Overlap-save chunks (P, nfft) from the extended input.

        WITHOUT a P-way slice/stack (125 small copies cost ~30% of the
        whole op): reshape to rows of `valid` and concatenate Q
        row-shifted views, so chunk p = ext[p*valid : p*valid+nfft]
        comes from Q unit-stride slices total.
        """
        V, F = self.valid, self.nfft
        Q = -(-F // V)  # rows spanned by one chunk
        rows_n = P + Q - 1
        xp = jnp.pad(ext, (0, rows_n * V - ext.shape[-1]))
        rows = xp.reshape(rows_n, V)
        return jnp.concatenate(
            [jax.lax.dynamic_slice_in_dim(rows, q, P, axis=0) for q in range(Q)],
            axis=-1,
        )[:, :F]  # (P, nfft)

    def poly_spectrum(self, chunks):
        """Polyphase-split forward transform: (P, nfft) -> (P, R, nif).

        Length-nif FFT batch over the chunk polyphase components — the
        outer Cooley-Tukey stage lives in the fold table G (__init__).
        Measured ~8.6x faster than the direct nfft-point FFT batch on
        v5e at the 64-VFO plan shape.
        """
        P = chunks.shape[0]
        cp = chunks.reshape(P, self.nif, self.ratio)
        return jnp.fft.fft(jnp.swapaxes(cp, -1, -2))

    def __call__(self, state, x):
        n = x.shape[-1]
        assert n % self.block_len == 0, (n, self.block_len)
        K = n // self.block_len
        assert x.ndim == 1, "FFT channelizer front takes the shared wideband"
        x = x.astype(jnp.complex64)
        ext = jnp.concatenate([jnp.asarray(state["tail"]), x])
        new_tail = ext[n:]
        # The same plan serves any multiple of block_len — the batched
        # steady-state path (`WbfmMultiVfoPipeline.scan_call`) feeds K
        # blocks as ONE window and P simply scales, keeping the state
        # pytree (tail/hf/rot tables) identical to the per-block program.
        P = K * self.n_chunks
        hf = jnp.asarray(state["hf"])
        if self._sparse:
            X = jnp.fft.fft(self.chunk_matrix(ext, P))
            Xr = X.reshape(P, self.ratio, self.nif)
            # gather each channel's live alias rows, multiply-reduce over
            # them: (P, C, Rk, nif) x (C, Rk, nif) -> (C, P, nif)
            idx = jnp.asarray(state["fold_idx"])  # (C, Rk)
            Xg = Xr[:, idx, :]  # (P, C, Rk, nif)
            S = jnp.einsum("pcrk,crk->cpk", Xg, hf) / self.ratio
        else:
            if self._pallas_chunks:
                from ..kernels.pallas_chunks import chunk_poly

                o_re, o_im = chunk_poly(
                    jnp.real(ext), jnp.imag(ext), valid=self.valid,
                    ratio=self.ratio, nif=self.nif, n_chunks=P,
                    group=self._pallas_group,
                )
                Fp = jnp.fft.fft(jax.lax.complex(o_re, o_im))
            else:
                Fp = self.poly_spectrum(self.chunk_matrix(ext, P))
            # Alias fold: at small C the "psk,csk->cpk" einsum pads the
            # MXU's C-wide output (~94% lane waste at C=8); the
            # k-batched dot_general form (nif,P,R)@(nif,R,C) measured
            # 28% faster incl. its layout transposes (exp/fold8.py) and
            # lifts the 8-VFO pipeline 6182 -> 6246 Msps.  At C=64 the
            # isolated probe also won (17%) but the FULL pipeline
            # REGRESSED 6135 -> 5596 (the extra transposes break the
            # FFT->fold fusion at that scale), so the k-batched form is
            # gated to C <= 16.  Same DEFAULT contraction precision; 1/R
            # folded into G either way.
            # gate on the LOCAL channel count (hf leading dim): under
            # shard_map the per-shard C is n_channels / channel_shards,
            # and the contraction shape — not the global VFO count — is
            # what the formulation choice depends on (review finding r5)
            if hf.shape[0] <= 16:
                Xk = jnp.transpose(Fp, (2, 0, 1))
                Gk = jnp.transpose(hf, (2, 1, 0))
                S = jax.lax.dot_general(
                    Xk, Gk, (((2,), (1,)), ((0,), (0,)))
                )
                S = jnp.transpose(S, (2, 1, 0))  # (C, P, nif)
            else:
                S = jnp.einsum("psk,csk->cpk", Fp, hf)
        y = jnp.fft.ifft(S)  # (C, P, nif) — C local under shard_map
        m0 = (self.tpad - 1) // self.ratio
        y = y[:, :, m0 : m0 + self.valid // self.ratio]
        y = y.reshape(y.shape[0], n // self.ratio)
        if self.skip_rotator:
            st_rot = state["rot"]
        elif K == 1:
            st_rot, y = self.rot(state["rot"], y)
        else:
            st_rot, y = self.rot.rotate_blocks(state["rot"], y, K)
        new_state = {"tail": new_tail, "hf": state["hf"], "rot": st_rot}
        if self._sparse:
            new_state["fold_idx"] = state["fold_idx"]
        return new_state, y


def _pallas_eligible(resampler: RationalResampler) -> bool:
    if resampler.predecim is None or not resampler.predecim.stages:
        return False
    s0 = resampler.predecim.stages[0]
    return s0.decimation in (2, 4, 8) and s0.ntaps <= s0.decimation + 32


class Channelizer(StreamOp):
    """N simultaneous VFOs: mixer -> shared-rate resampler -> opt. lowpass.

    All channels share the output sample rate (the common case: N radio
    VFOs at the same IF rate), so the resampler program is identical per
    channel and vectorizes over the leading axis for free.
    Parity: ``RxVFO`` (``rx_vfo.h:89-100``) per channel.

    ``method``: "auto" (fused Pallas on TPU backends), "pallas",
    "pallas-interpret" (testing), "xla", or "pfb" (shared M-bin
    polyphase filter bank, `shard/pfb.py` — opt-in: its heavy stages
    are channel-count independent, which starts to pay beyond ~100
    simultaneous VFOs; below that the alias-fold FFT front measures
    faster on v5e because the fold runs on the MXU).
    """

    def __init__(
        self,
        offsets_hz,
        in_samplerate: float,
        out_samplerate: float,
        block_len: int,
        low_pass_bw: float | None = None,
        method: str = "auto",
        sparse_thresh_db: float | None = None,
        skip_rotator: bool = False,
    ):
        self.offsets = np.asarray(offsets_hz, np.float64)
        self.skip_rotator = bool(skip_rotator)
        self.resampler = RationalResampler(in_samplerate, out_samplerate)
        assert block_len % self.resampler.block_multiple() == 0, (
            f"block_len {block_len} not a multiple of "
            f"{self.resampler.block_multiple()}"
        )
        self.n_channels = len(self.offsets)
        self.block_len = int(block_len)

        has_predecim = (
            self.resampler.predecim is not None
            and len(self.resampler.predecim.stages) > 0
        )
        if method == "auto":
            # FFT overlap-save front end when an integer predecimation
            # exists and the block factors into FFT-friendly chunks
            # (~2.8x the time-domain modulated-taps path on TPU v5e);
            # otherwise fall back to the time-domain paths.
            if has_predecim:
                try:
                    _plan_fft_chunks(
                        self.block_len,
                        int(
                            np.prod(
                                [s.decimation for s in self.resampler.predecim.stages]
                            )
                        ),
                        len(
                            _cascade_equivalent_taps(
                                [
                                    (np.asarray(s.taps), s.decimation)
                                    for s in self.resampler.predecim.stages
                                ]
                            )
                        ),
                    )
                    method = "fft"
                except ValueError:
                    method = "xla-fused"
            else:
                method = "xla"
        if method in ("pallas", "pallas-interpret") and not _pallas_eligible(
            self.resampler
        ):
            raise ValueError("resampler plan not eligible for the fused kernel")
        if method in ("xla-fused", "fft") and not has_predecim:
            method = "xla"
        self.method = method
        # "complete" fused fronts produce the IF rate directly (no rest
        # stages / generic polyphase tail to run afterwards)
        self._fused_complete = method == "pfb"

        if method == "pfb":
            from .pfb import PfbChannelizer

            self.fused = PfbChannelizer(
                self.offsets, in_samplerate, out_samplerate, block_len
            )
            self.rest_stages = []
            self.mixer = None
        elif method in ("pallas", "pallas-interpret"):
            s0 = self.resampler.predecim.stages[0]
            self.fused = FusedChannelizerStage(
                self.offsets,
                in_samplerate,
                np.asarray(s0.taps),
                s0.decimation,
                block_len,
                interpret=(method == "pallas-interpret"),
            )
            self.rest_stages = self.resampler.predecim.stages[1:]
            self.mixer = None
        elif method in ("xla-fused", "fft"):
            cls = ModulatedDecimatorChain if method == "xla-fused" else FftDecimatorChain
            kw = ({"sparse_thresh_db": sparse_thresh_db,
                   "skip_rotator": self.skip_rotator}
                  if method == "fft" else {})
            self.fused = cls(
                self.offsets,
                in_samplerate,
                [
                    (np.asarray(s.taps), s.decimation)
                    for s in self.resampler.predecim.stages
                ],
                block_len,
                **kw,
            )
            self.rest_stages = []
            self.mixer = None
        else:
            self.fused = None
            self.rest_stages = []
            self.mixer = MultiVfoMixer(
                [-f for f in self.offsets], in_samplerate, block_len
            )

        if self.skip_rotator and self.method != "fft":
            raise ValueError(
                "skip_rotator is only supported on the fft channelizer "
                f"(resolved method: {self.method})"
            )
        if low_pass_bw is not None:
            self.lpf = Fir(
                tapsmod.low_pass(
                    low_pass_bw / 2.0, low_pass_bw * 0.05, out_samplerate
                ),
                dtype=jnp.complex64,
            )
        else:
            self.lpf = None

    def init_state(self):
        st = {"lpf": self.lpf.init_state() if self.lpf else ()}
        if self.fused is not None:
            st["fused"] = self.fused.init_state()
            st["rest"] = tuple(
                np.zeros((self.n_channels, s.ntaps - 1), np.complex64)
                for s in self.rest_stages
            )
            st["poly"] = (
                self.resampler.resamp.init_state()
                if self.resampler.resamp and not self._fused_complete
                else ()
            )
        else:
            st["mixer"] = self.mixer.init_state()
            st["resamp"] = self.resampler.init_state()
        return st

    def out_len(self, n: int) -> int:
        return self.resampler.out_len(n)

    def retune_state(self, state, offsets_hz) -> dict:
        """Move all VFO offsets without retracing.

        Host-rebuilds the front end's offset tables (fused FFT/xla-fused
        chains: `FftDecimatorChain`/`ModulatedDecimatorChain`
        ``retune_state``; plain-xla path: `MultiVfoMixer.retune_state`)
        and keeps every carried tail: per-channel IF histories are
        dimensionally identical across offsets, so the swap causes only a
        filter-length transient — the same behavior as the reference's
        live setOffset (``rx_vfo.h:72-77``).  Only the opt-in Pallas
        method keeps its taps as trace constants and must rebuild.
        """
        offsets = np.asarray(offsets_hz, np.float64)
        assert offsets.shape == self.offsets.shape
        st = dict(state)
        if self.method == "pfb":
            st["fused"] = self.fused.retune_state(state["fused"], offsets)
        elif self.method in ("fft", "xla-fused"):
            stages = [
                (np.asarray(s.taps), s.decimation)
                for s in self.resampler.predecim.stages
            ]
            st["fused"] = self.fused.retune_state(
                state["fused"], offsets, self.resampler.in_samplerate, stages
            )
        elif self.method == "xla":
            st["mixer"] = self.mixer.retune_state(
                state["mixer"], [-f for f in offsets]
            )
        else:
            raise NotImplementedError(
                f"state-swap retune not supported for the opt-in "
                f"{self.method} channelizer; rebuild instead"
            )
        self.offsets = offsets
        return st

    def __call__(self, state, x):
        st = dict(state)
        if self.fused is not None:
            st["fused"], y = self.fused(state["fused"], x)  # (C, n/M1)
            new_rest = []
            for s, rst in zip(self.rest_stages, state["rest"]):
                rst, y = s(rst, y)
                new_rest.append(rst)
            st["rest"] = tuple(new_rest)
            if self.resampler.resamp is not None and not self._fused_complete:
                st["poly"], y = self.resampler.resamp(state["poly"], y)
        else:
            st["mixer"], y = self.mixer(state["mixer"], x)  # (C, n)
            st["resamp"], y = self.resampler(state["resamp"], y)
        if self.lpf:
            st["lpf"], y = self.lpf(state["lpf"], y)
        return st, y
