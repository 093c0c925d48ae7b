"""Honest device timing on tunnelled TPU backends.

Measured facts about this environment (axon TPU tunnel, v5e), which
break every naive timing recipe:

* ``jax.block_until_ready`` returns ~0.2 ms after enqueueing ~45 ms of
  device work — on this backend it often acknowledges *dispatch*, not
  *completion* (and sometimes does block; the semantics are
  inconsistent across output types).  Per-call wall-clock around
  ``block_until_ready`` is therefore untrustworthy.
* A device->host transfer (even of a single ready scalar) costs ~25 ms
  of tunnel round-trip latency, so "sync with ``float(x)``" overstates
  short kernels by orders of magnitude; a fresh tiny program (e.g. a
  first ``x[0]``) adds ~850 ms of compile on top.

The only robust recipe is two-point slope timing: enqueue ``k`` chained
repetitions of the workload followed by ONE forced host transfer, for
two values of ``k``; the per-repetition device time is the slope

    t_per_rep = (T(k2) - T(k1)) / (k2 - k1)

which cancels both the dispatch cost and the constant sync latency.
The repetition counts auto-scale until the timing delta clears the
tunnel's noise floor, so microsecond kernels are measured as accurately
as millisecond solves.  All benchmark numbers in this repo are
slope-timed.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import numpy as np

#: wall-clock delta (s) the two-point measurement must reach before the
#: slope is trusted; the tunnel's sync constant is ~25 ms with a few ms
#: of jitter, so 20 ms keeps the noise contribution under ~10%.
MIN_DELTA = 0.02

#: repetition-count ceiling (runaway guard for sub-microsecond bodies)
MAX_REPS = 4096


def sync(tree) -> None:
    """Force completion of everything ``tree`` depends on.

    ``jax.block_until_ready`` is not trustworthy here (see module
    docstring); a host transfer is.  Transfers the first leaf in full —
    slicing would dispatch (and on first use, compile) a fresh gather
    program, observed at ~880 ms on the tunnel.  The transfer cost is
    constant across repetition counts, so slope timing cancels it."""
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        np.asarray(jax.device_get(leaves[0]))


def _slope(timed: Callable[[int], float], k1: int = 2, k2: int = 8,
           min_delta: float = MIN_DELTA, max_reps: int = MAX_REPS) -> float:
    """Auto-scaling two-point slope: grow k2 until the delta clears the
    noise floor (or the rep ceiling is hit)."""
    t1 = timed(k1)
    while True:
        t2 = timed(k2)
        if t2 - t1 >= min_delta or k2 >= max_reps:
            return max((t2 - t1) / (k2 - k1), 1e-12)
        k1, t1 = k2, t2
        k2 *= 4


def measure_chain(fn: Callable, init, *, trials: int = 3,
                  min_delta: float = MIN_DELTA) -> float:
    """Per-call device seconds for ``fn`` (an endofunction: out -> in).

    Chaining makes repetitions sequentially dependent so the device
    cannot overlap them.  ``min`` over ``trials`` rejects host-side
    scheduling noise."""

    def timed(k: int) -> float:
        best = float("inf")
        for _ in range(trials):
            x = init
            t0 = time.perf_counter()
            for _ in range(k):
                x = fn(x)
            sync(x)
            best = min(best, time.perf_counter() - t0)
        return best

    # warm: compile + one full sync so timing starts from an idle device
    x = fn(init)
    sync(x)
    return _slope(timed, min_delta=min_delta)


def measure_call(fn: Callable, *args, trials: int = 3,
                 min_delta: float = MIN_DELTA) -> float:
    """Per-call device seconds for ``fn(*args)`` (independent calls).

    The device executes enqueued programs serially, so back-to-back
    independent calls still measure true per-call time; the slope
    cancels dispatch + sync constants exactly as in
    :func:`measure_chain`."""

    def timed(k: int) -> float:
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            out = None
            for _ in range(k):
                out = fn(*args)
            sync(out)
            best = min(best, time.perf_counter() - t0)
        return best

    out = fn(*args)
    sync(out)
    return _slope(timed, min_delta=min_delta)
