"""Named-section wall-clock timing (the reference's Utils::Timer role,
/root/reference/src/Utils/Timer.cpp) plus a context-manager API and
``jax.profiler`` integration for device-side traces."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


class Timer:
    """Accumulating named-section timer.

    >>> t = Timer()
    >>> with t.section("factorize"):
    ...     work()
    >>> t.report()
    """

    def __init__(self):
        self._elapsed: Dict[str, float] = {}
        self._counts: Dict[str, int] = {}
        self._starts: Dict[str, float] = {}

    def start(self, name: str) -> None:
        self._starts[name] = time.perf_counter()

    def stop(self, name: str) -> float:
        dt = time.perf_counter() - self._starts.pop(name)
        self._elapsed[name] = self._elapsed.get(name, 0.0) + dt
        self._counts[name] = self._counts.get(name, 0) + 1
        return dt

    @contextlib.contextmanager
    def section(self, name: str):
        self.start(name)
        try:
            yield self
        finally:
            self.stop(name)

    def elapsed(self, name: str) -> float:
        return self._elapsed.get(name, 0.0)

    @staticmethod
    def _fmt(seconds: float) -> str:
        if seconds < 1e-3:
            return f"{seconds * 1e6:.1f} us"
        if seconds < 1.0:
            return f"{seconds * 1e3:.2f} ms"
        return f"{seconds:.3f} s"

    def report(self, print_fn=print) -> str:
        lines = ["Timing report:"]
        for name in sorted(self._elapsed):
            n = self._counts[name]
            total = self._elapsed[name]
            lines.append(f"  {name}: {self._fmt(total)}"
                         f" ({n} calls, {self._fmt(total / n)}/call)")
        out = "\n".join(lines)
        if print_fn is not None:
            print_fn(out)
        return out


@contextlib.contextmanager
def device_trace(logdir: Optional[str] = None):
    """Wrap a region in a jax.profiler trace (XLA device timeline).

    With logdir=None this is a no-op context (cheap to leave in place)."""
    if logdir is None:
        yield
        return
    import jax
    with jax.profiler.trace(logdir):
        yield
