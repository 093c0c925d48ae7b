#!/usr/bin/env python
"""Hardware validation of the fused block-cyclic-reduction kernels.

Run from /root/repo on the TPU, preferably under tmux (killing a
mid-compile/mid-execute TPU process wedges the tunnel — CLAUDE.md):

    python tools/cr_pallas_probe.py [small|bench]

Reports, separately: Mosaic compile wall-time, correctness vs the XLA
cr_factor/cr_solve path, and slope-timed factor+solve cost.  The bench
shape is the BENCH_MODE=arrow configuration (N=256 blocks of b=16).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from ipmzoo_tpu.ops.banded import cr_factor, cr_solve
from ipmzoo_tpu.ops.cr_pallas import cr_factor_pallas, cr_solve_pallas
from ipmzoo_tpu.utils.timing import measure_call, sync


def make(N, b, seed=0):
    rng = np.random.default_rng(seed)
    E = (0.1 * rng.standard_normal((N - 1, b, b))).astype(np.float32)
    D = np.zeros((N, b, b), np.float32)
    for i in range(N):
        M = 0.1 * rng.standard_normal((b, b))
        D[i] = M @ M.T + np.eye(b) * (2.0 + rng.random())
    r = rng.standard_normal((N, b, 2)).astype(np.float32)
    return jnp.asarray(D), jnp.asarray(E), jnp.asarray(r)


def main(shape="small"):
    N, b = (16, 4) if shape == "small" else (256, 16)
    print(f"backend={jax.default_backend()} shape: N={N} blocks of b={b}")
    D, E, r = make(N, b)

    t0 = time.time()
    lowered = jax.jit(cr_factor_pallas).lower(D, E)
    print(f"lower(factor): {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    cfac = lowered.compile()
    print(f"compile(factor): {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    f = cfac(D, E)
    sync(f.Pinv)
    print(f"first run(factor): {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    lowered_s = jax.jit(cr_solve_pallas).lower(f, r)
    print(f"lower(solve): {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    csol = lowered_s.compile()
    print(f"compile(solve): {time.time() - t0:.1f}s", flush=True)
    x = csol(f, r)
    sync(x)

    # correctness vs the XLA path
    fx = jax.jit(cr_factor)(D, E)
    xx = jax.jit(cr_solve)(fx, r)
    err = float(jnp.max(jnp.abs(x - xx)) / (1 + jnp.max(jnp.abs(xx))))
    print(f"max rel err vs XLA cr path: {err:.3e}", flush=True)

    t_f = measure_call(cfac, D, E)
    t_s = measure_call(csol, f, r)
    print(f"factor: {t_f * 1e3:.3f} ms   solve: {t_s * 1e3:.3f} ms")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "small")
