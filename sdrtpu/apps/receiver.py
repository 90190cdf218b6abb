"""Receiver orchestration: source -> frontend -> VFOs -> demods -> sinks.

The functional analog of the reference's signal-path managers
(``core/src/signal_path/``):

- `IQFrontend` ~ ``IQFrontEnd`` (``iq_frontend.cpp:17-70``): optional DC
  block, spectrum branch, N VFO DDCs.
- `Receiver` ~ ``MainWindow`` + ``SourceManager`` + ``SinkManager`` wiring:
  pulls host IQ blocks from a source, runs the compiled step, hands audio
  and spectra to sinks.
- Framing (`BlockFramer`) ~ ``SampleFrameBuffer``: accumulates arbitrary
  source read sizes into the fixed block quantum the compiled program
  needs, carrying the remainder.

The whole frontend+VFOs+demods is ONE jitted program per configuration;
retuning or toggling blocks builds a new program (cached by XLA).
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from ..graph.block import StreamOp
from ..graph.compile import complexify, realify, to_numpy
from ..kernels.fftspec import SpectrumAnalyzer
from ..kernels.iir import DcBlocker
from ..kernels.mixer import FreqXlator
from ..kernels.resample import IntegerDecimator, RationalResampler
from .radio import MODE_INFO, RadioChain


@dataclass
class VfoConfig:
    offset_hz: float
    mode: str = "wfm"
    bandwidth: float | None = None
    squelch_db: float | None = None
    stereo: bool = True
    ctcss_tone: int | None = None


class BlockFramer:
    """Accumulate arbitrary-size host reads into fixed-size blocks."""

    def __init__(self, block_len: int, dtype=np.complex64):
        self.block_len = int(block_len)
        self._buf = np.zeros(0, dtype)

    def push(self, samples: np.ndarray):
        self.append(samples)
        while True:
            out = self.pop_block()
            if out is None:
                return
            yield out

    def append(self, samples: np.ndarray) -> None:
        self._buf = np.concatenate([self._buf, samples])

    def pop_block(self) -> np.ndarray | None:
        if len(self._buf) < self.block_len:
            return None
        out = self._buf[: self.block_len]
        self._buf = self._buf[self.block_len :]
        return out

    @property
    def pending(self) -> int:
        return len(self._buf)


class Vfo(StreamOp):
    """Single-VFO DDC + radio chain: xlate -> resample to IF -> RadioChain.

    ``emit_iq=True`` additionally returns the IF-rate IQ ahead of the
    demodulator (the reference's VFO output stream that iq_exporter and
    digital decoders bind to, ``iq_frontend.cpp:132-138``).
    """

    def __init__(self, cfg: VfoConfig, in_samplerate: float, audio_rate: float,
                 emit_iq: bool = False):
        self.cfg = cfg
        self.emit_iq = emit_iq
        self.in_samplerate = float(in_samplerate)
        self.xlator = FreqXlator(-cfg.offset_hz, in_samplerate)
        self.radio = RadioChain(
            cfg.mode,
            audio_rate=audio_rate,
            bandwidth=cfg.bandwidth,
            squelch_db=cfg.squelch_db,
            stereo=cfg.stereo,
            ctcss_tone=cfg.ctcss_tone,
        )
        # DDC targets the chain's actual IF rate (RAW mode overrides
        # MODE_INFO's nominal rate with the audio rate, radio_module's
        # "demodulators/raw.h" behavior)
        self.ddc = RationalResampler(in_samplerate, self.radio.if_rate)

    def block_multiple(self) -> int:
        return self.ddc.block_multiple() * self.radio.block_multiple()

    def bind(self, block_len: int) -> None:
        """Fix the input block length: switch the DDC mixer to the
        state-table `TunableXlator` so `retune_state` can move the VFO
        without retracing."""
        from ..kernels.mixer import TunableXlator

        if not isinstance(self.xlator, TunableXlator):
            self.xlator = TunableXlator(
                -self.cfg.offset_hz, self.in_samplerate, block_len
            )

    def retune_state(self, state, offset_hz: float) -> dict:
        """Move this VFO's offset via a state-table swap (bound VFOs)."""
        from ..kernels.mixer import TunableXlator

        if not isinstance(self.xlator, TunableXlator):
            raise NotImplementedError(
                "retune_state needs a bound VFO (Receiver binds at build)"
            )
        st = dict(state)
        st["xl"] = self.xlator.retune_state(state["xl"], -float(offset_hz))
        self.cfg.offset_hz = float(offset_hz)
        return st

    def init_state(self):
        return {
            "xl": self.xlator.init_state(),
            "ddc": self.ddc.init_state(),
            "radio": self.radio.init_state(),
        }

    def out_len(self, n: int) -> int:
        return self.radio.out_len(self.ddc.out_len(n))

    def __call__(self, state, x):
        st = dict(state)
        st["xl"], y = self.xlator(state["xl"], x)
        st["ddc"], y = self.ddc(state["ddc"], y)
        st["radio"], audio = self.radio(state["radio"], y)
        if self.emit_iq:
            return st, (audio, y)
        return st, audio


class IQFrontend(StreamOp):
    """DC block + spectrum branch + N named VFOs as one stream op.

    VFOs sharing an IF rate are fused into one `Channelizer` front end
    (FFT overlap-save mix+decimate, ~10x the per-VFO path for many VFOs)
    once `bind()` fixes the block length — `Receiver` does this
    automatically; single VFOs of a rate keep the per-VFO xlate+resample
    path.  ``fuse=False`` disables grouping.
    """

    def __init__(
        self,
        samplerate: float,
        vfos: dict[str, VfoConfig],
        audio_rate: float = 48000.0,
        dc_block: bool = False,
        decimation: int = 1,
        fft_size: int = 65536,
        fft_rate: float = 20.0,
        spectrum: bool = True,
        fuse: bool = True,
    ):
        # optional frontend decimation ahead of everything, the analog of
        # IQFrontEnd's PowerDecimator + effective samplerate
        # (iq_frontend.cpp:17-70)
        self.samplerate = float(samplerate)
        self.decimation = int(decimation)
        self.predecim = (
            IntegerDecimator(samplerate, self.decimation)
            if self.decimation > 1 else None
        )
        eff = self.samplerate / self.decimation
        self.effective_samplerate = eff
        self.dc = DcBlocker(50.0 / eff) if dc_block else None
        self.spectrum = (
            SpectrumAnalyzer(eff, fft_size, fft_rate) if spectrum else None
        )
        self.vfos = {
            name: Vfo(cfg, eff, audio_rate) for name, cfg in vfos.items()
        }
        self._fuse = fuse
        self._groups: dict[float, tuple[list[str], object]] = {}
        self._bound_len: int | None = None

    def block_multiple(self) -> int:
        m = 1
        for v in self.vfos.values():
            m = np.lcm(m, v.block_multiple())
        if self.spectrum:
            m = np.lcm(m, self.spectrum.interval)
        return int(m) * self.decimation

    def bind(self, block_len: int) -> None:
        """Fix the input block length; fuse same-IF-rate VFO groups.

        The fused `Channelizer` (FFT overlap-save) needs a static block
        length for its chunk plan and mixer tables, so grouping happens
        here rather than in ``__init__``.  Idempotent per length.
        """
        if self._bound_len == block_len:
            return
        if self._bound_len is not None:
            # the fused channelizers and any live Receiver state are
            # specific to one block length; silent rebinding would corrupt
            # the first receiver's traced program
            raise ValueError(
                f"IQFrontend already bound to block_len={self._bound_len}; "
                "create a separate IQFrontend per Receiver"
            )
        from ..shard.channelizer import Channelizer

        inner = block_len // self.decimation
        if self._fuse:
            by_rate: dict[float, list[str]] = {}
            for name, vfo in self.vfos.items():
                by_rate.setdefault(vfo.radio.if_rate, []).append(name)
            self._groups = {}
            for if_rate, names in by_rate.items():
                if len(names) < 2:
                    continue
                offsets = [self.vfos[n].cfg.offset_hz for n in names]
                try:
                    chan = Channelizer(
                        offsets, self.effective_samplerate, if_rate, inner
                    )
                except (AssertionError, ValueError):
                    continue  # no valid plan for this length: stay per-VFO
                self._groups[if_rate] = (names, chan)
        grouped = self._grouped_names()
        for name, vfo in self.vfos.items():
            if name not in grouped:
                vfo.bind(inner)  # state-table mixer: retune w/o retrace
        self._bound_len = block_len

    def _grouped_names(self) -> set:
        out = set()
        for names, _ in self._groups.values():
            out.update(names)
        return out

    def retune(self, state, name: str, offset_hz: float):
        """Move one VFO without retracing the compiled program.

        ``state`` is the complex-domain frontend state; returns the
        updated state.  Grouped (fused-channelizer) VFOs swap the whole
        group's offset tables; per-VFO paths swap their mixer tables.
        The reference analog is ``VFOManager::setOffset`` -> live
        ``RxVFO::setOffset`` (``vfo_manager.cpp:30-42``).
        """
        if name not in self.vfos:
            raise KeyError(name)
        st = dict(state)
        for if_rate, (names, chan) in self._groups.items():
            if name in names:
                offsets = [
                    offset_hz if n == name else self.vfos[n].cfg.offset_hz
                    for n in names
                ]
                key = f"{if_rate:.0f}"
                new_chan = dict(st["chan"])
                new_chan[key] = chan.retune_state(st["chan"][key], offsets)
                st["chan"] = new_chan
                self.vfos[name].cfg.offset_hz = float(offset_hz)
                return st
        new_vfos = dict(st["vfos"])
        new_vfos[name] = self.vfos[name].retune_state(
            st["vfos"][name], offset_hz
        )
        st["vfos"] = new_vfos
        return st

    def init_state(self):
        grouped = self._grouped_names()
        st = {
            "pre": self.predecim.init_state() if self.predecim else (),
            "dc": self.dc.init_state() if self.dc else (),
            "vfos": {
                n: (
                    {"radio": v.radio.init_state()}
                    if n in grouped
                    else v.init_state()
                )
                for n, v in self.vfos.items()
            },
        }
        if self._groups:
            st["chan"] = {
                f"{if_rate:.0f}": chan.init_state()
                for if_rate, (_, chan) in self._groups.items()
            }
        return st

    def __call__(self, state, x):
        st = {"pre": state["pre"], "dc": state["dc"], "vfos": {}}
        if self.predecim:
            st["pre"], x = self.predecim(state["pre"], x)
        if self.dc:
            st["dc"], x = self.dc(state["dc"], x)
        spec = None
        if self.spectrum:
            _, spec = self.spectrum((), x)
        audios = {}
        grouped = self._grouped_names()
        if self._groups:
            st["chan"] = {}
            for if_rate, (names, chan) in self._groups.items():
                key = f"{if_rate:.0f}"
                st["chan"][key], rows = chan(state["chan"][key], x)
                for i, name in enumerate(names):
                    vfo = self.vfos[name]
                    rst, audios[name] = vfo.radio(
                        state["vfos"][name]["radio"], rows[i]
                    )
                    st["vfos"][name] = {"radio": rst}
        for name, vfo in self.vfos.items():
            if name in grouped:
                continue
            st["vfos"][name], audios[name] = vfo(state["vfos"][name], x)
        return st, (audios, spec)


class Receiver:
    """Host-side driver: framing, compiled dispatch, sink fan-out.

    ``audio_sinks``: name -> callable(audio (2,n) float32).
    ``spectrum_sink``: callable(db (frames, fft) float32).
    """

    def __init__(
        self,
        frontend: IQFrontend,
        block_len: int | None = None,
        audio_sinks: dict[str, Callable] | None = None,
        spectrum_sink: Callable | None = None,
        baseband_sinks: list[Callable] | None = None,
        scan_batch: int = 1,
        metrics=None,
        async_fetch: int | str = 0,
    ):
        from .. import enable_compile_cache

        enable_compile_cache()  # reconfigure = cached rebuild (SURVEY §5.6)
        self.frontend = frontend
        m = frontend.block_multiple()
        if block_len is None:
            block_len = max(1, 250000 // m) * m
        assert block_len % m == 0, f"block_len must be a multiple of {m}"
        self.block_len = block_len
        if hasattr(frontend, "bind"):
            frontend.bind(block_len)  # fuse same-IF-rate VFO groups
        self.framer = BlockFramer(block_len)
        self.audio_sinks = audio_sinks or {}
        self.spectrum_sink = spectrum_sink
        # host-side raw-IQ taps (bindIQStream parity: recorder baseband,
        # iq_exporter) — fed every whole input block before dispatch
        self.baseband_sinks = baseband_sinks or []
        # scan_batch > 1 processes that many blocks per device dispatch via
        # lax.scan — the steady-state execution mode that amortizes host
        # dispatch latency (SURVEY §2.2: one fused program scanned over
        # time blocks).
        self.scan_batch = int(scan_batch)
        self._pending: list[np.ndarray] = []
        # guards _rstate AND the framer/pending host buffers: retune()
        # and save_checkpoint() may be called from another thread
        # (webview/rigctl/scheduler) while push() is framing + dispatching
        # — the reference serializes the same way with its ctrlMtx
        # (``block.h:46-62``).  Every dispatch path computes under the
        # lock and emits to sinks after releasing it.
        self._state_lock = threading.RLock()
        # structured observability (SURVEY §5.5): input throughput +
        # real-time factor, per-sink audio level gauges
        self.metrics = metrics
        self._thr = (
            metrics.throughput("receiver.input", frontend.samplerate)
            if metrics is not None
            else None
        )
        # async_fetch: overlap the per-block device->host result fetches.
        # JAX dispatch is already asynchronous — what serializes a live
        # session on a remote-tunneled device is the ~25-30 ms RTT each
        # synchronous np.asarray(audio) fetch pays (bench_latency.py,
        # docs/PERF.md round 4).  With a small fetch pool, push() only
        # dispatches; worker threads materialize results concurrently and
        # a single emitter thread delivers them to sinks IN ORDER.
        # "auto" sizes the pool from the measured fetch RTT at warmup():
        # ceil(RTT / block_interval) + 1, clamped to [2, 16] (VERDICT r4
        # #4a).  0 = fully synchronous (previous behavior).
        self.async_fetch = async_fetch
        self._emit_error = None
        self._fetch_pool = None
        self._emit_q = None
        self._emitter = None
        if isinstance(async_fetch, int) and async_fetch > 0:
            self._start_async(async_fetch)

        self._build_steps()
        # live demod-switch program cache: (vfo_name, mode, bandwidth) ->
        # (built Vfo, jitted step, jitted scan step).  Reusing the cached
        # closures avoids both the re-trace AND the XLA compile on a
        # switch back (the reference keeps all demodulators constructed,
        # radio_module.h:90-110)
        self._mode_programs: dict = {}
        self._rstate = realify(frontend.init_state())
        self._warmed = False

    def _build_steps(self) -> None:
        """(Re)build the jitted step closures over the current frontend.

        Called at construction and after structural changes like
        `set_mode` — the closures capture the frontend object, so
        mutating it would not invalidate jit's cache by itself.
        """
        frontend = self.frontend

        @jax.jit
        def _step(rstate, re, im):
            state = complexify(rstate)
            state, (audios, spec) = frontend(state, jax.lax.complex(re, im))
            return realify(state), (audios, spec)

        @jax.jit
        def _step_scan(rstate, re, im):  # re/im: (K, block_len)
            # `scan_call` is the steady-state batch entry: the default is
            # lax.scan of the step, and ops with a batched formulation
            # (e.g. the flagship pipeline) override it (graph/block.py)
            state = complexify(rstate)
            state, (audios, spec) = frontend.scan_call(
                state, jax.lax.complex(re, im)
            )
            return realify(state), (audios, spec)

        self._step = _step
        self._step_scan = _step_scan

    def set_mode(self, name: str, mode: str,
                 bandwidth: float | None = None) -> float:
        """Switch a VFO's demodulator live; returns the switch latency (s).

        The analog of the reference's demod selection
        (``radio_module.h:402-416`` — which logs the same latency).
        Rebuilds the VFO chain for the new mode, re-jits the step (an XLA
        cache hit when this mode was used before at this configuration),
        and re-initializes that VFO's DSP state (a demod switch re-locks
        in the reference too).
        """
        import time as _time

        import dataclasses
        t0 = _time.perf_counter()
        fe = self.frontend
        if name not in fe.vfos:
            raise KeyError(name)
        with self._state_lock:
            if name in fe._grouped_names():
                raise NotImplementedError(
                    "demod switch on a fused-group VFO: rebuild the "
                    "Receiver (group plans are mode-rate-specific)"
                )
            old = fe.vfos[name]
            offset = old.cfg.offset_hz
            # bandwidth=None keeps the VFO's configured bandwidth for
            # modes it applies to (review finding r5: it used to reset
            # to the mode default AND mis-key the cache)
            new_bw = bandwidth if bandwidth is not None else old.cfg.bandwidth

            def _cfg_key():
                # the cached closures capture the WHOLE frontend, so the
                # key must cover every VFO's demod-relevant config — a
                # per-VFO key could replay a trace holding a sibling
                # VFO's stale chain (review finding r5)
                return tuple(sorted(
                    (n, v.cfg.mode, v.cfg.bandwidth)
                    for n, v in fe.vfos.items()
                ))

            # remember the outgoing program so switching back is instant
            self._mode_programs.setdefault(
                _cfg_key(), (old, self._step, self._step_scan))
            want = tuple(sorted(
                (n, mode if n == name else vv.cfg.mode,
                 new_bw if n == name else vv.cfg.bandwidth)
                for n, vv in fe.vfos.items()
            ))
            cached = self._mode_programs.get(want)
            if cached is not None:
                new, self._step, self._step_scan = cached
                fe.vfos[name] = new
            else:
                cfg = dataclasses.replace(
                    old.cfg, mode=mode, bandwidth=new_bw)
                new = Vfo(cfg, fe.effective_samplerate,
                          old.radio.audio_rate, emit_iq=old.emit_iq)
                inner = self.block_len // fe.decimation
                assert inner % new.block_multiple() == 0, (
                    f"block_len {self.block_len} incompatible with mode "
                    f"{mode} (quantum {new.block_multiple()})"
                )
                new.bind(inner)
                fe.vfos[name] = new
                self._build_steps()
                self._mode_programs[_cfg_key()] = (
                    new, self._step, self._step_scan)
            # swap ONLY the switched VFO's subtree: whole-state
            # complexify/realify costs one device op per leaf (~0.4 s
            # through the tunnel, measured in the round-5 live session);
            # the new chain's init state is host numpy, so this is pure
            # host work
            rst = dict(self._rstate)
            vfos = dict(rst["vfos"])
            vst = new.init_state()
            if abs(new.cfg.offset_hz - offset) > 1e-9:
                vst = new.retune_state(vst, offset)
            vfos[name] = realify(vst)
            rst["vfos"] = vfos
            self._rstate = rst
            self._warmed = False
        # compile (or cache-hit) the new program immediately so the next
        # push doesn't stall; functional step — discarding the result
        # leaves the receiver state untouched
        zeros = np.zeros(self.block_len, np.float32)
        self._step(self._rstate, zeros, zeros)
        return _time.perf_counter() - t0

    def save_checkpoint(self, path: str) -> None:
        """Snapshot the full DSP state mid-stream (SURVEY §5.4).

        Captures loop carries, filter tails and mixer phases plus the
        framer remainder and any batch-queued blocks, so a restarted
        process resumes losslessly (the reference loses PLL/filter state
        on restart).  Resume is bit-exact for ``scan_batch=1``; with
        batching, restored pending blocks replay through the single-step
        program where the uninterrupted run used the scan body, so
        continuation matches within float-reassociation tolerance.
        """
        from ..graph.checkpoint import save_state

        with self._state_lock:
            # pending (framed but not yet dispatched) batch blocks are
            # part of the un-consumed input: fold them back in FRONT of
            # the framer remainder so the snapshot loses nothing when
            # scan_batch > 1
            buf = np.concatenate(
                [*self._pending, self.framer._buf]
            ) if self._pending else self.framer._buf
            save_state(path, {
                "rstate": jax.tree_util.tree_map(np.asarray, self._rstate),
                "framer_buf": buf,
            })

    def load_checkpoint(self, path: str) -> None:
        """Restore a `save_checkpoint` snapshot into this receiver."""
        from ..graph.checkpoint import load_state

        with self._state_lock:
            like = {
                "rstate": jax.tree_util.tree_map(np.asarray, self._rstate),
                "framer_buf": self.framer._buf,
            }
            data = load_state(path, like)
            self._rstate = data["rstate"]
            buf = np.asarray(data["framer_buf"], np.complex64)
            # whole blocks in the snapshot (saved pending) go back to the
            # pending queue; push()/drain() dispatch them before new input
            nb = len(buf) // self.block_len
            self._pending = [
                buf[i * self.block_len:(i + 1) * self.block_len]
                for i in range(nb)
            ]
            self.framer._buf = buf[nb * self.block_len:]
            # the restored rstate may still have init shapes (snapshot
            # taken before any dispatch): re-run the single-step shape
            # stabilization before the first batched scan
            self._warmed = False

    def retune(self, name: str, offset_hz: float) -> None:
        """Live-retune one VFO: state-table swap, no recompilation.

        Thread-safe against concurrent dispatches (webview/rigctl call
        this from their own threads).  Only the retuned subtree is
        converted: complexify/realify over the WHOLE state eagerly
        re-materializes every leaf as a separate device op — ~3 s
        through a remote tunnel's per-dispatch RTT (measured in the
        round-5 live session); the subtree path is milliseconds.
        """
        fe = self.frontend
        if name not in fe.vfos:
            raise KeyError(name)
        with self._state_lock:
            rst = dict(self._rstate)
            hit = None
            for if_rate, (names, chan) in fe._groups.items():
                if name in names:
                    hit = (f"{if_rate:.0f}", names, chan)
                    break
            if hit is not None:
                key, names, chan = hit
                offsets = [
                    offset_hz if n == name else fe.vfos[n].cfg.offset_hz
                    for n in names
                ]
                chans = dict(rst["chan"])
                chans[key] = realify(
                    chan.retune_state(complexify(rst["chan"][key]), offsets)
                )
                rst["chan"] = chans
                fe.vfos[name].cfg.offset_hz = float(offset_hz)
            else:
                vfos = dict(rst["vfos"])
                vst = dict(vfos[name])
                # TunableXlator tables are host-real: swap costs no
                # device work at all (the carried phase leaf passes
                # through untouched)
                vst["xl"] = realify(fe.vfos[name].xlator.retune_state(
                    complexify(vst["xl"]), -float(offset_hz)
                ))
                fe.vfos[name].cfg.offset_hz = float(offset_hz)
                vfos[name] = vst
                rst["vfos"] = vfos
            self._rstate = rst

    def _start_async(self, workers: int) -> None:
        import queue
        from concurrent.futures import ThreadPoolExecutor

        self.async_fetch = int(workers)
        self._fetch_pool = ThreadPoolExecutor(max_workers=self.async_fetch)
        # bounded: push() backpressures instead of racing unboundedly
        # ahead of the fetch drain; 4x workers of slack so a single RTT
        # spike doesn't stall the producer (round-5 live session: with
        # 2x, each ~100 ms spike cost ~150 ms of unreclaimable stall)
        self._emit_q = queue.Queue(maxsize=4 * self.async_fetch)
        self._emitter = threading.Thread(target=self._emit_loop, daemon=True)
        self._emitter.start()

    def _materialize(self, payload):
        baseband, audios, spec, batched, vf = payload
        audios = {k: np.asarray(v) for k, v in audios.items()}
        spec = np.asarray(spec) if spec is not None else None
        return baseband, audios, spec, batched, vf

    def _emit_loop(self) -> None:
        while True:
            fut = self._emit_q.get()
            if fut is None:
                self._emit_q.task_done()
                return
            try:
                self._emit(*fut.result())
            except Exception as e:  # noqa: BLE001
                # a failing sink must not kill the emitter: in sync mode
                # the exception reaches the push() caller; here the
                # thread records it and keeps draining (otherwise the
                # bounded queue fills and push()/sync() deadlock
                # silently — review finding r5).  sync() re-raises.
                self._emit_error = e
            finally:
                self._emit_q.task_done()

    def _dispatch_emit(self, payload) -> None:
        if self._fetch_pool is None:
            self._emit(*payload)
            return
        self._emit_q.put(self._fetch_pool.submit(self._materialize, payload))

    def sync(self) -> None:
        """Block until every dispatched result has reached its sinks.

        Re-raises the first sink/materialize error the emitter thread
        swallowed (it keeps draining so push() never deadlocks)."""
        if self._emit_q is not None:
            self._emit_q.join()
        if self._emit_error is not None:
            err, self._emit_error = self._emit_error, None
            raise err

    def warmup(self) -> None:
        """Compile the processing step ahead of live data.

        Runs the jitted step once on a zero block and resets state, so
        the first real `push` doesn't stall on XLA compilation (the
        analog of the reference starting its DSP threads before play).
        """
        zeros = np.zeros(self.block_len, np.float32)
        state0 = self._rstate
        # two steps: the first traces from init-state shapes, the second
        # from the stabilized steady-state shapes (broadcasted IIR
        # carries etc.) — both programs end up compiled
        st, _ = self._step(state0, zeros, zeros)
        self._step(st, zeros, zeros)
        if self.scan_batch > 1:
            # the batched path is its own XLA program; compile it on the
            # steady-state shapes it will actually see (live streaming
            # single-dispatches the first block, then scans)
            zb = np.zeros((self.scan_batch, self.block_len), np.float32)
            self._step_scan(st, zb, zb)
        self._rstate = state0
        if self.async_fetch == "auto" and self._fetch_pool is None:
            # measure the device->host fetch RTT with the compiled step:
            # median of 3 round trips on the zero block
            import time as _time

            laps = []
            st2 = state0
            for _ in range(3):
                t0 = _time.perf_counter()
                st2, (audios, _sp) = self._step(st2, zeros, zeros)
                for v in audios.values():
                    np.asarray(v)
                    break
                laps.append(_time.perf_counter() - t0)
            rtt = sorted(laps)[len(laps) // 2]
            interval = self.block_len / self.frontend.samplerate
            # +3 (not +1): the pool's sustained fetch rate is
            # workers/RTT — at +1 a ~30% RTT spike saturates it and the
            # producer stalls; the extra workers are ~1.5x headroom
            workers = min(16, max(2, int(np.ceil(rtt / interval)) + 3))
            self._start_async(workers)
            self._rstate = state0

    def push(self, iq: np.ndarray) -> None:
        """Feed host IQ samples; dispatches as blocks/batches fill.

        The state lock is held per BLOCK (frame-pop + compiled step as
        one atomic unit; sink emission outside), so control threads
        (retune/checkpoint via webview/rigctl/scheduler) wait at most one
        dispatch even when a whole file arrives in a single push().
        """
        if self._thr is not None:
            self._thr.add(len(iq))
        restored = []
        with self._state_lock:
            self.framer.append(np.asarray(iq, np.complex64))
            if self.scan_batch <= 1 and self._pending:
                # checkpoint-restored blocks precede new input; compute
                # under the lock, emit outside it
                restored = self._drain_compute()
        for payload in restored:
            self._dispatch_emit(payload)
        while True:
            payload = None
            with self._state_lock:
                block = self.framer.pop_block()
                if block is None:
                    break
                if self.scan_batch <= 1:
                    payload = self._compute(block)
                else:
                    self._pending.append(block)
                    if not self._warmed:
                        # first block goes through the single-step path so
                        # the state pytree takes its steady shapes before
                        # scanning
                        payload = self._compute(self._pending.pop(0))
                        self._warmed = True
                    elif len(self._pending) >= self.scan_batch:
                        batch = self._pending[: self.scan_batch]
                        self._pending = self._pending[self.scan_batch :]
                        payload = self._compute_batch(batch)
            if payload is not None:
                self._dispatch_emit(payload)

    def _drain_compute(self) -> list:
        """Run compiled steps for all pending blocks (caller holds the
        lock); returns the `_emit` payloads so sinks run OUTSIDE it."""
        payloads = [self._compute(block) for block in self._pending]
        self._pending = []
        return payloads

    def drain(self) -> None:
        """Dispatch any buffered whole blocks (before flush/shutdown).

        Like every dispatch path, sink fan-out happens after the state
        lock is released — a blocked sink must never hold up
        retune/checkpoint (advisor finding r2)."""
        with self._state_lock:
            payloads = self._drain_compute()
        for payload in payloads:
            self._dispatch_emit(payload)

    def _emit(
        self, baseband, audios, spec, batched: bool,
        valid_fraction: float = 1.0,
    ) -> None:
        # baseband sinks run here — OUTSIDE the state lock — so a blocking
        # sink (e.g. a stalled SdrppServer client) can never freeze
        # retune/save_checkpoint (advisor finding r2, receiver.py:563)
        for sink in self.baseband_sinks:
            for b in baseband:
                sink(b)
        for name, sink in self.audio_sinks.items():
            if name in audios:
                a = np.asarray(audios[name])
                if batched:  # (K, ...) -> concatenate along time
                    a = np.concatenate(list(a), axis=-1)
                if valid_fraction < 1.0:
                    a = a[..., : int(round(a.shape[-1] * valid_fraction))]
                if self.metrics is not None:
                    self.metrics.gauge(f"audio.{name}.rms").set(
                        float(np.sqrt(np.mean(np.square(a))))
                    )
                sink(a)
        if self.spectrum_sink is not None and spec is not None:
            s = np.asarray(spec)
            if batched:
                s = s.reshape(-1, s.shape[-1])
            if valid_fraction < 1.0:
                s = s[: int(round(s.shape[0] * valid_fraction))]
            self.spectrum_sink(s)

    def _compute(self, block: np.ndarray, valid_fraction: float = 1.0):
        """One compiled step (caller holds the state lock); returns the
        `_emit` payload so ALL sink fan-out runs outside the lock."""
        bb = (block if valid_fraction >= 1.0
              else block[: int(round(len(block) * valid_fraction))])
        re = np.ascontiguousarray(block.real)
        im = np.ascontiguousarray(block.imag)
        self._rstate, (audios, spec) = self._step(self._rstate, re, im)
        return [bb], audios, spec, False, valid_fraction

    def _compute_batch(self, blocks: list[np.ndarray]):
        re = np.stack([np.ascontiguousarray(b.real) for b in blocks])
        im = np.stack([np.ascontiguousarray(b.imag) for b in blocks])
        self._rstate, (audios, spec) = self._step_scan(self._rstate, re, im)
        return list(blocks), audios, spec, True, 1.0

    def flush(self) -> None:
        """Dispatch any pending partial block (stream tail).

        The tail block is zero-padded up to the program's static block
        length, but sink output is trimmed back to the true input length
        (recorder durations match capture durations; the reference never
        pads because its blocks are dynamic, ``stream.h:43-92``).
        """
        payloads = []
        with self._state_lock:
            payloads += self._drain_compute()
            if self.framer.pending:
                frac = self.framer.pending / self.block_len
                pad = self.block_len - self.framer.pending
                for block in self.framer.push(np.zeros(pad, np.complex64)):
                    payloads.append(self._compute(block, valid_fraction=frac))
        for payload in payloads:
            self._dispatch_emit(payload)
        self.sync()

    def run_file(self, path: str) -> None:
        """Process a whole IQ WAV recording (file_source parity)."""
        from ..io import wav

        info, iq = wav.read_iq_wav(path)
        if abs(info.samplerate - self.frontend.samplerate) > 1:
            raise ValueError(
                f"file rate {info.samplerate} != receiver rate "
                f"{self.frontend.samplerate}"
            )
        self.push(iq)
        self.flush()
