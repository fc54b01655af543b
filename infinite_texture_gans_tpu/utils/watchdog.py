"""Training stall watchdog.

A wedged accelerator connection (observed on the tunneled axon backend:
the transport thread parks in ``wait_woken`` and a blocking ``device_get``
never returns, while FRESH connections to the same device keep working)
hangs a training run silently — no exception, no output, checkpoints stop.
The reference has nothing comparable (a CUDA hang surfaces as an NCCL/
kernel timeout); on a remote-attached TPU the failure mode is real enough
to deserve a first-class warning.

``StallWatchdog`` separates the pure stall arithmetic (``check``, unit-
testable with synthetic clocks) from a tiny daemon-thread wrapper
(``start``/``stop``). The train loop calls ``beat()`` after every genuine
device sync (the deferred epoch-metrics fetch); the watchdog learns the
typical beat interval and warns — to stderr, once per stall episode —
when progress stops for ``max(min_grace_s, factor * median_interval)``.
It never kills the run: a stalled dispatch cannot be cancelled from
Python, and the right remedy (probe the device from a separate process,
then kill and ``--resume``) needs the operator.
"""

from __future__ import annotations

import statistics
import sys
import threading
import time
from typing import Callable, List, Optional


class StallWatchdog:
    def __init__(
        self,
        min_grace_s: float = 300.0,
        factor: float = 20.0,
        poll_s: float = 15.0,
        warn: Optional[Callable[[str], None]] = None,
        clock: Callable[[], float] = time.monotonic,
    ) -> None:
        self.min_grace_s = float(min_grace_s)
        self.factor = float(factor)
        self.poll_s = float(poll_s)
        self._warn = warn or (lambda msg: print(msg, file=sys.stderr, flush=True))
        self._clock = clock
        self._lock = threading.Lock()
        self._last_beat: Optional[float] = None
        self._intervals: List[float] = []
        self._warned_for: Optional[float] = None
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()

    # ---- pure logic -------------------------------------------------
    def beat(self) -> None:
        """Record one unit of real progress (a completed device sync)."""
        now = self._clock()
        with self._lock:
            if self._last_beat is not None:
                self._intervals.append(now - self._last_beat)
                if len(self._intervals) > 64:  # rolling window
                    del self._intervals[0]
            self._last_beat = now
            self._warned_for = None  # new episode baseline

    def threshold_s(self) -> float:
        with self._lock:
            if not self._intervals:
                return self.min_grace_s
            return max(self.min_grace_s, self.factor * statistics.median(self._intervals))

    def check(self, now: Optional[float] = None) -> Optional[str]:
        """Return a warning message if progress has stalled, once per
        episode; None otherwise. Pure — safe to call from tests."""
        if now is None:
            now = self._clock()
        with self._lock:
            last = self._last_beat
            warned = self._warned_for
        if last is None:
            return None  # not started yet (first compile can take minutes)
        stalled_s = now - last
        thr = self.threshold_s()
        if stalled_s < thr or warned == last:
            return None
        with self._lock:
            self._warned_for = last
        med = statistics.median(self._intervals) if self._intervals else float("nan")
        return (
            f"[watchdog] no training progress for {stalled_s:.0f} s "
            f"(typical epoch {med:.1f} s, threshold {thr:.0f} s). The device "
            "connection may be wedged: probe from a SEPARATE process with "
            "`python -c \"import jax; print(jax.devices())\"`. If the probe "
            "succeeds but this run stays stuck, the connection is dead — "
            "kill this process and restart with --resume <last checkpoint>."
        )

    # ---- thread wrapper ----------------------------------------------
    def start(self) -> "StallWatchdog":
        if self._thread is None:
            self._stop.clear()
            self._thread = threading.Thread(
                target=self._run, name="stall-watchdog", daemon=True
            )
            self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2 * self.poll_s)
            self._thread = None

    def _run(self) -> None:
        while not self._stop.wait(self.poll_s):
            msg = self.check()
            if msg is not None:
                self._warn(msg)
