"""Flagship pipeline: wideband IQ -> N simultaneous WBFM stereo receivers.

This is BASELINE config 3 ("8 simultaneous VFOs off one 10 Msps capture")
fused with config 1's WBFM chain: one jitted program takes a wideband IQ
block and produces N stereo 48 kHz audio streams.

    wideband (fs_in) ──Channelizer──> (C, n_if) @ 250 kHz
      per channel:  BroadcastFM stereo (pilot-normalized)  -> (2, C, n_if)
      audio:        RationalResampler 250k->48k (batched)  -> (2, C, n_af)
                    Deemphasis 50 us                       -> audio out

Reference chain being matched: Splitter -> RxVFO xlator/resampler
(``iq_frontend.cpp:140-160``, ``rx_vfo.h:89-100``) -> radio WFM demod
(``demodulators/wfm.h``, ``broadcast_fm.h:144-215``) -> AF resample +
deemphasis (``radio_module.h:98-110``).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from ..graph.block import StreamOp
from ..kernels.iir import Deemphasis
from ..kernels.resample import RationalResampler
from ..kernels.wfm import BroadcastFm
from ..shard.channelizer import Channelizer


class WbfmMultiVfoPipeline(StreamOp):
    """Full multi-VFO WBFM receiver as one stream op.

    ``block_len`` is the wideband input block length (must be a multiple of
    `block_multiple()`).
    """

    def __init__(
        self,
        offsets_hz,
        in_samplerate: float,
        block_len: int,
        if_rate: float = 250000.0,
        audio_rate: float = 48000.0,
        deviation: float = 75000.0,
        stereo: bool = True,
        tau: float = 50e-6,
        channelizer_method: str = "auto",
        sparse_fold_db: float | None = None,
        spectrum: bool = False,
        fft_size: int = 65536,
        fft_rate: float = 20.0,
        pilot_mode: str = "envelope",
        skip_rotator: bool = False,
    ):
        self.offsets = np.asarray(offsets_hz, np.float64)
        self.n_channels = len(self.offsets)
        self.block_len = int(block_len)
        # NOTE: "auto" picks the modulated-taps xla-fused front end (mix
        # folded into the first decimation stage).  The Pallas kernel path
        # remains opt-in via channelizer_method="pallas" until its in-scan
        # stability on the TPU runtime is fully validated.
        # sparse_fold_db: opt-in sparse alias fold (see FftDecimatorChain)
        # — the dense fold's FLOPs scale with C*nfft and dominate at many
        # channels, while only the few alias rows crossing each channel's
        # passband carry energy.  Measured slower at C=8, faster at C=64.
        # skip_rotator (opt-in, round 5): the FM discriminator is
        # rotation-transparent, so the channelizer's per-sample residual
        # rotator can be skipped and compensated by one per-channel
        # constant multiply inside the discriminator product (exact
        # algebra; the residual angle rides in the demod's quad state so
        # retunes stay a table swap).
        self.skip_rotator = bool(skip_rotator)
        self.channelizer = Channelizer(
            self.offsets, in_samplerate, if_rate, block_len,
            method=channelizer_method, sparse_thresh_db=sparse_fold_db,
            skip_rotator=self.skip_rotator,
        )
        # The 15 kHz audio lowpass (`BroadcastFm(low_pass=True)`'s two
        # 237-tap FIRs, ~0.06 ms/block) is folded into the audio
        # resampler's polyphase prototype instead: passband 15 kHz,
        # stopband at the 19 kHz pilot.  The polyphase matmul's cost is
        # independent of prototype length, so the combined filter is free
        # and sharper than the reference's cascade (lpf -> resampler).
        # pilot_mode "envelope": the real-bandpass + segment-mean pilot
        # normalization (kernels/wfm.py) — algebraically equal to the
        # "normalized" analytic path's Re(conj(vco)^2) at half the pilot
        # FFT batch (the demod's dominant cost at many channels).
        # subcarrier_droop_comp: the channelized IF always comes from a
        # decimating DDC, whose phase-difference discriminator carries an
        # inherent sinc(f/fs_if) MPX droop (-0.34 dB at 38 kHz -> ~34 dB
        # stereo separation ceiling; the reference ships the droop,
        # quadrature.h:39-46).  The design-time minimax scalar on the
        # L-R product lifts pipeline separation to 56+ dB at ZERO
        # runtime cost (the 11-tap mpx_eq FIR measured the same quality
        # but cost 7.6% of 64-VFO throughput).
        self.demod = BroadcastFm(
            deviation=deviation,
            samplerate=if_rate,
            stereo=stereo,
            low_pass=False,
            pilot_mode=pilot_mode,
            subcarrier_droop_comp=True,
            channel_derotate=self.skip_rotator,
        )
        # Audio is real stereo: resample in float32 (half the arithmetic
        # and HBM traffic of the complex path).
        self.audio_resamp = RationalResampler(
            if_rate, audio_rate, dtype=jnp.float32,
            bw=15000.0, trans_bw=4000.0,
        )
        # channels=1: scalar initial state broadcasts over the (2, C, n)
        # batched audio; it stabilizes to (2, C, 1) after the first block.
        self.deemph = Deemphasis(tau, audio_rate)
        n_if = self.channelizer.out_len(block_len)
        assert n_if % self.audio_resamp.block_multiple() == 0, (
            f"IF block {n_if} not a multiple of audio quantum "
            f"{self.audio_resamp.block_multiple()}"
        )
        # Optional per-window reduction applied to the spectrum INSIDE
        # the steady-state scan (e.g. jnp.max for a benchmark probe):
        # without it, a K=256 dispatch stacks (K, F, fft_size) dB frames
        # (~64 MB of scan-output traffic) that a consumer wanting only a
        # summary would immediately reduce anyway.  None = full frames.
        self.spec_reduce = None
        # Optional waterfall branch, matching the reference front end where
        # the FFT path always runs beside the VFOs (iq_frontend.cpp:17-70,
        # default 65536 bins @ 20 Hz per core.cpp:126-128).
        self.spectrum = None
        if spectrum:
            from ..kernels.fftspec import SpectrumAnalyzer

            self.spectrum = SpectrumAnalyzer(in_samplerate, fft_size, fft_rate)
            assert block_len % self.spectrum.interval == 0, (
                f"block {block_len} not a multiple of FFT interval "
                f"{self.spectrum.interval}"
            )

    @staticmethod
    def block_multiple(in_samplerate, if_rate=250000.0, audio_rate=48000.0) -> int:
        front = RationalResampler(in_samplerate, if_rate)
        audio = RationalResampler(if_rate, audio_rate)
        return front.block_multiple() * audio.block_multiple()

    def init_state(self):
        st = {
            "chan": self.channelizer.init_state(),
            "demod": self.demod.init_state(),
            "audio": self.audio_resamp.init_state(),
            "deemph": self.deemph.init_state(),
        }
        if self.skip_rotator:
            st["demod"] = dict(st["demod"])
            st["demod"]["quad"] = {
                "prev": st["demod"]["quad"]["prev"],
                "rot": self.channelizer.fused.residual_omega.copy(),
            }
        return st

    def out_len(self, n: int) -> int:
        n_if = self.channelizer.out_len(n)
        return self.audio_resamp.out_len(n_if)

    def retune_state(self, state, offsets_hz) -> dict:
        """Retune every VFO without recompiling the jitted program.

        Offset-dependent tables live in the state pytree (channelizer
        ``hf`` + rotator tables); demod/audio carries are per-channel and
        offset-independent.  Cost = host table rebuild (ms) + one state
        upload — vs minutes for a retrace on this backend
        (BENCH_r01 recorded 668 s for the flagship compile).
        """
        st = dict(state)
        st["chan"] = self.channelizer.retune_state(state["chan"], offsets_hz)
        self.offsets = np.asarray(offsets_hz, np.float64)
        if self.skip_rotator:
            st["demod"] = dict(st["demod"])
            q = dict(st["demod"]["quad"])
            q["rot"] = self.channelizer.fused.residual_omega.copy()
            st["demod"]["quad"] = q
        return st

    def __call__(self, state, x):
        st = dict(state)
        st["chan"], y = self.channelizer(state["chan"], x)  # (C, n_if)
        st["demod"], (stereo, _) = self.demod(state["demod"], y)  # (2, C, n_if)
        st["audio"], a = self.audio_resamp(state["audio"], stereo)  # (2, C, n_af)
        st["deemph"], a = self.deemph(state["deemph"], a)
        if self.spectrum is not None:
            _, spec = self.spectrum((), x)  # (frames, fft_size) dB
            return st, (a, spec)
        return st, a

    # -- batched steady-state execution -------------------------------------
    #
    # Per 500k-sample block, the IF-rate back end (demod/audio/deemphasis/
    # waterfall) touches <1 MB of data — inside a lax.scan over K blocks it
    # is pure per-op dispatch overhead, measured at over half the pipeline's
    # device time.  Streaming ops are associative over concatenation
    # (process(concat(blocks)) == sequential per-block processing), so only
    # the channelizer front end scans per block; everything downstream runs
    # ONCE on the concatenated (C, K*n_if) window.  This replaces nothing in
    # the reference — its thread-per-block runtime (``stream.h:43-92``)
    # amortizes the same way by accident of OS scheduling — but on TPU it is
    # the difference between ~22% and >40% HBM utilization.

    def _front_body(self, chan_state, xb):
        chan_state, y = self.channelizer(chan_state, xb)
        segs = self.spectrum.extract(xb) if self.spectrum is not None else ()
        return chan_state, (y, segs)

    def _back_end(self, st, state, y, segs, K: int):
        """Shared IF-rate tail: demod -> audio -> deemph (+ batched
        spectrum transform), reframed per block.

        ``y``: (C, K*n_if); ``segs``: (K*F, nz) raw spectrum segments
        (ignored when the spectrum branch is off).  Used by both the
        straight-line window path and the per-block front-scan fallback
        so the back-end chain exists exactly once.
        """
        st["demod"], (stereo, _) = self.demod(state["demod"], y)
        st["audio"], a = self.audio_resamp(state["audio"], stereo)
        st["deemph"], a = self.deemph(state["deemph"], a)  # (2, C, K*n_af)
        a = a.reshape(a.shape[0], a.shape[1], K, -1)
        a = jnp.moveaxis(a, 2, 0)  # (K, 2, C, n_af) — per-block framing
        if self.spectrum is not None:
            spec = self.spectrum.transform(segs)
            if self.spec_reduce is not None:
                return st, (a, self.spec_reduce(spec))
            return st, (a, spec.reshape(K, -1, spec.shape[-1]))
        return st, a

    def _back_batch(self, state, chan_state, ys, segs, K: int):
        """ys: (K, C, n_if) from a per-block front scan -> outputs."""
        st = {"chan": chan_state}
        C = ys.shape[1]
        y = jnp.moveaxis(ys, 0, 1).reshape(C, -1)  # (C, K*n_if)
        if self.spectrum is not None:
            segs = segs.reshape(K * segs.shape[1], segs.shape[2])
        return self._back_end(st, state, y, segs, K)

    def _batched(self, state, x_cat, K: int):
        """One straight-line program over the concatenated K-block window.

        The overlap-save channelizer handles any multiple of block_len
        directly (its only sequential carry is the input tail; the
        residual rotator's per-block phase recurrence unrolls in closed
        form — `MultiVfoMixer.rotate_blocks`), so the ENTIRE dispatch is
        scan-free: no per-iteration output stacking (measured ~0.05
        ms/block of pure dynamic-update-slice traffic on v5e), no
        (K, C, n_if) -> (C, K*n_if) transpose.
        """
        st = dict(state)
        st["chan"], y = self.channelizer(state["chan"], x_cat)  # (C, K*nif)
        segs = (self.spectrum.extract(x_cat)
                if self.spectrum is not None else ())
        return self._back_end(st, state, y, segs, K)

    def _front_window(self, state, xw, sub: int):
        """Per-block front scan over one sub-window + shared back end —
        the fallback for channelizer methods without K-window support
        (xla-fused / pallas), bounded by the same sub-window size as the
        straight-line path so the back end never sees the degraded
        >100 MB-intermediate regime."""
        chan_state, (ys, segs) = jax.lax.scan(
            self._front_body, state["chan"], xw
        )
        return self._back_batch(state, chan_state, ys, segs, sub)

    # Sub-window length for the batched steady-state path, in SAMPLES.
    # Measured on v5e (8-VFO flagship, 500k blocks, sweep of the
    # sub-window size): per-block throughput peaks at ~4M-sample windows
    # (3870 Msps at 8 blocks/window) and DEGRADES beyond (2602 at 16,
    # 736 at 32 — large FFT batches / >100 MB intermediates fall off the
    # backend's fast path), while a per-block scan pays ~0.05 ms/block
    # stacking the IF output (2800 at 1).  A scan over ~4M-sample fully
    # batched sub-windows gets both amortization and the fast regime.
    SUB_SAMPLES = float(os.environ.get("SDRTPU_SUB_SAMPLES", 4e6))

    def _subk(self, K: int) -> int:
        env = os.environ.get("SDRTPU_SUBK")
        # FLOOR, not round: the ~4M-sample window optimum is a ceiling
        # (the chunk-matrix cliff), so a block that alone approaches it
        # must run sub=1 — at the 64-VFO 2.5M-block config, rounding up
        # to sub=2 (5M windows) cost 25% end to end (4707 -> 3600 Msps,
        # round-4 composed-prefix measurement in docs/PERF.md).
        want = (int(env) if env
                else max(1, int(self.SUB_SAMPLES // self.block_len)))
        sub = min(K, max(1, want))
        while K % sub:
            sub -= 1
        return sub

    @staticmethod
    def _stabilize(state, body, xw0):
        """Broadcast not-yet-steady state leaves (scalar IIR carries on a
        fresh stream) to the shapes the scan body produces, so the carry
        typechecks without requiring a warmup call first."""
        out_sd = jax.eval_shape(body, state, xw0)[0]
        return jax.tree_util.tree_map(
            lambda leaf, sd: jnp.broadcast_to(
                jnp.asarray(leaf), sd.shape
            ).astype(sd.dtype),
            state, out_sd,
        )

    def scan_call(self, state, xs):
        """K stacked wideband blocks ``(K, block_len)`` -> K blocks of output.

        Outputs match `lax.scan` of `__call__` over the same blocks (same
        per-block framing) up to float reassociation; the audio arrives as
        ``(K, 2, C, n_af)`` and spectra as ``(K, frames, fft_size)``.
        """
        K = xs.shape[0]
        sub = self._subk(K)
        whole = self.channelizer.method in ("fft", "pfb")
        if sub == K:
            if whole:
                return self._batched(state, xs.reshape(-1), K)
            return self._front_window(state, xs, K)
        if whole:
            xw = xs.reshape(K // sub, sub * xs.shape[-1])

            def body(st, xsub):
                return self._batched(st, xsub, sub)
        else:
            xw = xs.reshape(K // sub, sub, xs.shape[-1])

            def body(st, xsub):
                return self._front_window(st, xsub, sub)

        state = self._stabilize(state, body, xw[0])
        st, outs = jax.lax.scan(body, state, xw)
        return st, jax.tree_util.tree_map(
            lambda a: (a.reshape((K,) + a.shape[2:])
                       if a.ndim >= 2 and a.shape[:2] == (K // sub, sub)
                       else a),
            outs,
        )

    def scan_repeat(self, state, x, K: int):
        """Like `scan_call` but re-processing ONE device-resident block K
        times (benchmark steady state: a NIC-fed ring buffer's working
        set)."""
        n = x.shape[-1]
        sub = self._subk(K)
        whole = self.channelizer.method in ("fft", "pfb")
        if whole:
            x_sub = jnp.broadcast_to(x[None, :], (sub, n)).reshape(-1)
            if sub == K:
                return self._batched(state, x_sub, K)

            def body(st, _):
                return self._batched(st, x_sub, sub)
        else:
            x_sub = jnp.broadcast_to(x[None, :], (sub, n))
            if sub == K:
                return self._front_window(state, x_sub, K)

            def body(st, _):
                return self._front_window(st, x_sub, sub)

        state = self._stabilize(state, lambda s, xv: body(s, None), None)
        st, outs = jax.lax.scan(body, state, None, length=K // sub)
        return st, jax.tree_util.tree_map(
            lambda a: (a.reshape((K,) + a.shape[2:])
                       if a.ndim >= 2 and a.shape[:2] == (K // sub, sub)
                       else a),
            outs,
        )
