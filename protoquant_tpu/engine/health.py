"""Failure detection / watchdog / fault injection (SURVEY.md §5.3).

Serving-grade minimum: a host heartbeat, a decode-step timeout watchdog, and
NaN/Inf detection on the decode path (debug mode). Fault injection hooks let
tests verify the detection paths fire. Multi-host recovery policy (re-init
over the remaining slice + replay from checkpoint) is documented in
docs/ARCHITECTURE.md; the detection primitives here are what trigger it.
"""

from __future__ import annotations

import os
import tempfile
import threading
import time

import jax.numpy as jnp
import numpy as np


class EngineHealthError(RuntimeError):
    pass


class Heartbeat:
    """Periodic liveness marker (file mtime), one per host process."""

    def __init__(self, path: str | None = None, interval_s: float = 5.0):
        self.path = path or os.path.join(
            tempfile.gettempdir(), f"protoquant_hb_{os.getpid()}"
        )
        self.interval_s = interval_s
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def beat(self):
        # Atomic replace: a monitor must never observe the truncated-but-
        # unwritten intermediate state of a plain open(path, "w") — that
        # reads as an empty file, which is_alive would misclassify as death.
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(time.time()))
        os.replace(tmp, self.path)

    def start(self):
        def loop():
            while not self._stop.wait(self.interval_s):
                self.beat()

        self.beat()
        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()

    @staticmethod
    def is_alive(path: str, stale_after_s: float = 30.0) -> bool:
        try:
            with open(path) as f:
                return time.time() - float(f.read()) < stale_after_s
        except (OSError, ValueError):
            return False


class StepWatchdog:
    """Flags decode steps exceeding a wall-clock budget.

    With ``budget_s=None`` (the engine default) the budget adapts to the
    serving workload: ``max(floor_s, multiplier x rolling-median step time)``
    once ``min_obs`` steps have been observed. A fixed budget loose enough to
    survive first-step compilation (minutes on TPU) would never fire on a
    real serving hang (steady steps are milliseconds); the adaptive budget
    tightens to the observed regime while the floor keeps late one-off
    compilations (a fresh prefill bucket) from false-firing.
    """

    def __init__(
        self,
        budget_s: float | None = 30.0,
        on_timeout=None,
        floor_s: float = 120.0,
        multiplier: float = 30.0,
        min_obs: int = 16,
    ):
        self.budget_s = budget_s
        self.on_timeout = on_timeout
        self.floor_s = floor_s
        self.multiplier = multiplier
        self.min_obs = min_obs
        self.timeouts = 0
        self.last_duration = 0.0
        self._window: list[float] = []  # rolling window (adaptive mode)

    def current_budget(self) -> float | None:
        """The budget in force now; None while adapting with too few steps."""
        if self.budget_s is not None:
            return self.budget_s
        if len(self._window) < self.min_obs:
            return None
        med = sorted(self._window)[len(self._window) // 2]
        return max(self.floor_s, self.multiplier * med)

    def observe(self, duration_s: float):
        self.last_duration = duration_s
        budget = self.current_budget()
        if self.budget_s is None:
            self._window.append(duration_s)
            if len(self._window) > 64:
                self._window.pop(0)
        if budget is not None and duration_s > budget:
            self.timeouts += 1
            if self.on_timeout is not None:
                self.on_timeout(duration_s)
            else:
                raise EngineHealthError(
                    f"decode step took {duration_s:.1f}s (> {budget:.1f}s budget)"
                )


def check_finite(name: str, arr) -> None:
    """NaN/Inf detection (debug mode — forces a device sync)."""
    a = np.asarray(arr, dtype=np.float32)
    if not np.all(np.isfinite(a)):
        bad = int(np.sum(~np.isfinite(a)))
        raise EngineHealthError(f"non-finite values in {name}: {bad} elements")


def inject_nan(cache, layer: int = 0):
    """Test-only fault injection: poison one layer's cache values."""
    import dataclasses

    c = cache[layer]
    if hasattr(c, "vs"):
        poisoned = dataclasses.replace(c, vs=c.vs.at[..., 0].set(jnp.nan))
    else:
        poisoned = dataclasses.replace(c, v=c.v.at[..., 0].set(jnp.nan))
    return cache[:layer] + [poisoned] + cache[layer + 1 :]
