"""Task scheduler — ``misc_modules/scheduler`` capability.

Time-based automation: at scheduled times run actions (tune, start/stop
recording, arbitrary callables).  Deterministic: `tick(now)` is driven by
the host loop (or a thread via `run_background`).
"""

from __future__ import annotations

import datetime
import threading
from dataclasses import dataclass, field
from typing import Callable


@dataclass
class Task:
    at: datetime.datetime
    action: Callable[[], None]
    name: str = ""
    recurring_days: int = 0  # 0 = one-shot; N = repeat every N days
    done: bool = False


class Scheduler:
    def __init__(self):
        self.tasks: list[Task] = []
        self._lock = threading.Lock()
        self._thread = None
        self._running = False

    def add(self, task: Task) -> None:
        with self._lock:
            self.tasks.append(task)

    def tick(self, now: datetime.datetime | None = None) -> int:
        """Run all due tasks; returns how many fired."""
        now = now or datetime.datetime.now()
        fired = 0
        with self._lock:
            for t in self.tasks:
                if t.done or t.at > now:
                    continue
                try:
                    t.action()
                finally:
                    fired += 1
                    if t.recurring_days:
                        t.at += datetime.timedelta(days=t.recurring_days)
                    else:
                        t.done = True
            self.tasks = [t for t in self.tasks if not t.done]
        return fired

    def run_background(self, interval: float = 1.0) -> None:
        self._running = True

        def loop():
            import time

            while self._running:
                self.tick()
                time.sleep(interval)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._running = False
