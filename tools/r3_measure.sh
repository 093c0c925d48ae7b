#!/bin/bash
# Round-3 TPU measurement sequence.  Run under tmux from /root/repo —
# NEVER under a kill-on-timeout wrapper (killing mid-compile/execute
# wedges the tunnel; see .claude/skills/verify/SKILL.md).
# Appends to tools/r3_measure.log; steps ordered safest-first.
cd /root/repo
LOG=tools/r3_measure.log
run() {
    echo "=== $* — $(date -u +%H:%M:%S)" | tee -a "$LOG"
    "$@" 2>&1 | grep -v "^WARNING" | tail -20 | tee -a "$LOG"
}
run python -c "import jax, jax.numpy as jnp; x=jnp.ones((512,512)); print('probe ok', float((x@x).sum()))"
run python tools/cr_pallas_probe.py small
run python tools/cr_pallas_probe.py bench
run env BENCH_WORKER=1 BENCH_MODE=fused python bench.py
run env BENCH_WORKER=1 BENCH_MODE=solve python bench.py
run env BENCH_WORKER=1 BENCH_MODE=arrow python bench.py
run env BENCH_WORKER=1 BENCH_MODE=nd python bench.py
run env BENCH_WORKER=1 BENCH_MODE=tf python bench.py
run env BENCH_WORKER=1 BENCH_MODE=normal python bench.py
run env BENCH_WORKER=1 BENCH_MODE=aug python bench.py
echo "=== done — $(date -u +%H:%M:%S)" | tee -a "$LOG"
