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
from ..kernels.resample import RationalResampler
from .radio import MODE_INFO, RadioChain


@dataclass
class VfoConfig:
    offset_hz: float
    mode: str = "wfm"
    bandwidth: float | None = None
    squelch_db: float | None = None
    stereo: bool = True


class BlockFramer:
    """Accumulate arbitrary-size host reads into fixed-size blocks."""

    def __init__(self, block_len: int, dtype=np.complex64):
        self.block_len = int(block_len)
        self._buf = np.zeros(0, dtype)

    def push(self, samples: np.ndarray):
        self._buf = np.concatenate([self._buf, samples])
        while len(self._buf) >= self.block_len:
            out = self._buf[: self.block_len]
            self._buf = self._buf[self.block_len :]
            yield out

    @property
    def pending(self) -> int:
        return len(self._buf)


class Vfo(StreamOp):
    """Single-VFO DDC + radio chain: xlate -> resample to IF -> RadioChain."""

    def __init__(self, cfg: VfoConfig, in_samplerate: float, audio_rate: float):
        self.cfg = cfg
        info = MODE_INFO[cfg.mode]
        self.xlator = FreqXlator(-cfg.offset_hz, in_samplerate)
        self.ddc = RationalResampler(in_samplerate, info["if_rate"])
        self.radio = RadioChain(
            cfg.mode,
            audio_rate=audio_rate,
            bandwidth=cfg.bandwidth,
            squelch_db=cfg.squelch_db,
            stereo=cfg.stereo,
        )

    def block_multiple(self) -> int:
        return self.ddc.block_multiple() * self.radio.block_multiple()

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
        return st, audio


class IQFrontend(StreamOp):
    """DC block + spectrum branch + N named VFOs as one stream op."""

    def __init__(
        self,
        samplerate: float,
        vfos: dict[str, VfoConfig],
        audio_rate: float = 48000.0,
        dc_block: bool = False,
        fft_size: int = 65536,
        fft_rate: float = 20.0,
        spectrum: bool = True,
    ):
        self.samplerate = float(samplerate)
        self.dc = DcBlocker(50.0 / samplerate) if dc_block else None
        self.spectrum = (
            SpectrumAnalyzer(samplerate, fft_size, fft_rate) if spectrum else None
        )
        self.vfos = {
            name: Vfo(cfg, samplerate, audio_rate) for name, cfg in vfos.items()
        }

    def block_multiple(self) -> int:
        m = 1
        for v in self.vfos.values():
            m = np.lcm(m, v.block_multiple())
        if self.spectrum:
            m = np.lcm(m, self.spectrum.interval)
        return int(m)

    def init_state(self):
        return {
            "dc": self.dc.init_state() if self.dc else (),
            "vfos": {n: v.init_state() for n, v in self.vfos.items()},
        }

    def __call__(self, state, x):
        st = {"dc": state["dc"], "vfos": {}}
        if self.dc:
            st["dc"], x = self.dc(state["dc"], x)
        spec = None
        if self.spectrum:
            _, spec = self.spectrum((), x)
        audios = {}
        for name, vfo in self.vfos.items():
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
    ):
        self.frontend = frontend
        m = frontend.block_multiple()
        if block_len is None:
            block_len = max(1, 250000 // m) * m
        assert block_len % m == 0, f"block_len must be a multiple of {m}"
        self.block_len = block_len
        self.framer = BlockFramer(block_len)
        self.audio_sinks = audio_sinks or {}
        self.spectrum_sink = spectrum_sink

        @jax.jit
        def _step(rstate, re, im):
            state = complexify(rstate)
            state, (audios, spec) = frontend(state, jax.lax.complex(re, im))
            return realify(state), (audios, spec)

        self._step = _step
        self._rstate = realify(frontend.init_state())

    def push(self, iq: np.ndarray) -> None:
        """Feed host IQ samples; dispatches full blocks as they fill."""
        for block in self.framer.push(np.asarray(iq, np.complex64)):
            self._dispatch(block)

    def _dispatch(self, block: np.ndarray) -> None:
        re = np.ascontiguousarray(block.real)
        im = np.ascontiguousarray(block.imag)
        self._rstate, (audios, spec) = self._step(self._rstate, re, im)
        for name, sink in self.audio_sinks.items():
            if name in audios:
                sink(np.asarray(audios[name]))
        if self.spectrum_sink is not None and spec is not None:
            self.spectrum_sink(np.asarray(spec))

    def flush(self) -> None:
        """Zero-pad and dispatch any pending partial block (stream tail)."""
        if self.framer.pending:
            pad = self.block_len - self.framer.pending
            for block in self.framer.push(np.zeros(pad, np.complex64)):
                self._dispatch(block)

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
