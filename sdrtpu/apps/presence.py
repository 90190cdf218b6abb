"""Rich-presence / now-listening status publisher.

Parity target: ``misc_modules/discord_integration`` — which formats a
"Frequency: X / Mode: Y" status and pushes it to Discord's local RPC
socket every ~1 s via the vendored discord-rpc SDK (19.8 kLoC).  The
capability is the *status feed*; the transport here is pluggable
(callback, file, or any writer) since this framework is headless and the
Discord daemon socket is an external service.  The default line format
matches the reference's presence details ("frequency - mode").
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Callable


def format_frequency(freq_hz: float) -> str:
    """Human-readable frequency (reference utils/utils.cpp style)."""
    if freq_hz >= 1e9:
        return f"{freq_hz / 1e9:g}GHz"
    if freq_hz >= 1e6:
        return f"{freq_hz / 1e6:g}MHz"
    if freq_hz >= 1e3:
        return f"{freq_hz / 1e3:g}kHz"
    return f"{freq_hz:g}Hz"


@dataclass
class PresencePublisher:
    """Publishes the tuned-state line whenever it changes.

    ``sinks``: callables receiving the status dict; throttled to at most
    one update per ``min_interval`` seconds (the reference updates at
    1 Hz — ``discord_integration/main.cpp`` presence loop).
    """

    app_name: str = "sdrtpu"
    min_interval: float = 1.0
    sinks: list[Callable[[dict], None]] = field(default_factory=list)
    _last: dict | None = None
    _last_time: float = 0.0

    def status(self, freq_hz: float, mode: str | None = None) -> dict:
        details = format_frequency(freq_hz)
        if mode:
            details += f" - {mode}"
        return {"app": self.app_name, "details": details, "freq": freq_hz,
                "mode": mode}

    def update(self, freq_hz: float, mode: str | None = None,
               now: float | None = None) -> bool:
        """Returns True if the status was published."""
        now = time.monotonic() if now is None else now
        st = self.status(freq_hz, mode)
        unchanged = self._last is not None and st == self._last
        if unchanged or (now - self._last_time) < self.min_interval and self._last:
            return False
        self._last, self._last_time = st, now
        for s in self.sinks:
            s(st)
        return True


def file_sink(path: str) -> Callable[[dict], None]:
    """Write the status as one JSON line (for external presence bridges)."""

    def sink(st: dict):
        with open(path, "w") as f:
            json.dump(st, f)
            f.write("\n")

    return sink
