"""Structured runtime metrics (SURVEY §5.5 observability).

The reference has no metrics beyond the ``flog`` text log and visual
widgets (SNR meter ``waterfall.cpp:922-932``, volume/peak meters,
``SpeedTester``).  Here observability is first-class and structured:
counters (samples/blocks per stage), gauges (SNR, lock state, audio
level), and throughput trackers (Msamples/s + real-time factor against a
declared sample rate), all snapshottable as one JSON-friendly dict.

Typical wiring::

    m = MetricsRegistry()
    thr = m.throughput("frontend", samplerate=10e6)
    ...
    thr.add(block_len)                    # per dispatched block
    m.gauge("vfo0.snr_db").set(snr)
    print(m.to_json())
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field


@dataclass
class Counter:
    value: int = 0

    def add(self, n: int = 1) -> None:
        self.value += int(n)


@dataclass
class Gauge:
    value: float = float("nan")

    def set(self, v: float) -> None:
        self.value = float(v)


@dataclass
class Throughput:
    """Samples/s over the registry's lifetime plus a recent-window rate."""

    samplerate: float | None = None
    clock: callable = time.monotonic
    total: int = 0
    _t0: float | None = None
    _t_last: float | None = None
    _win_samples: int = 0
    _win_t0: float | None = None
    window: float = 2.0

    def add(self, n: int) -> None:
        now = self.clock()
        if self._t0 is None:
            self._t0 = self._win_t0 = now
        self.total += int(n)
        self._win_samples += int(n)
        self._t_last = now
        if now - self._win_t0 > self.window:
            self._rate = self._win_samples / (now - self._win_t0)
            self._win_samples = 0
            self._win_t0 = now

    @property
    def rate(self) -> float:
        """Average samples/s since first add."""
        if self._t0 is None or self._t_last is None or self._t_last == self._t0:
            return 0.0
        return self.total / (self._t_last - self._t0)

    @property
    def realtime_factor(self) -> float:
        """rate / declared samplerate (>1 means faster than real time)."""
        if not self.samplerate:
            return float("nan")
        r = self.rate
        return r / self.samplerate if r else 0.0

    def snapshot(self) -> dict:
        return {
            "total_samples": self.total,
            "rate_sps": self.rate,
            "realtime_factor": self.realtime_factor,
        }


@dataclass
class MetricsRegistry:
    counters: dict[str, Counter] = field(default_factory=dict)
    gauges: dict[str, Gauge] = field(default_factory=dict)
    throughputs: dict[str, Throughput] = field(default_factory=dict)

    def counter(self, name: str) -> Counter:
        return self.counters.setdefault(name, Counter())

    def gauge(self, name: str) -> Gauge:
        return self.gauges.setdefault(name, Gauge())

    def throughput(self, name: str, samplerate: float | None = None,
                   clock=time.monotonic) -> Throughput:
        t = self.throughputs.get(name)
        if t is None:
            t = self.throughputs[name] = Throughput(samplerate, clock)
        elif samplerate is not None:
            t.samplerate = samplerate
        return t

    def snapshot(self) -> dict:
        return {
            "counters": {k: c.value for k, c in self.counters.items()},
            "gauges": {k: g.value for k, g in self.gauges.items()},
            "throughput": {k: t.snapshot() for k, t in self.throughputs.items()},
        }

    def to_json(self) -> str:
        return json.dumps(self.snapshot())
