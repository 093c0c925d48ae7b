#!/bin/bash
# Round-4 TPU measurement sequence.  Run under tmux from /root/repo:
#
#   tmux new -d -s r4 'bash tools/r4_measure.sh 2>&1 | tee -a tools/r4_measure.log'
#
# Each engine runs alone in bench.py's guarded subprocess (generous
# timeouts: a timeout kill mid-compile WEDGES the tunnel — see
# .claude/skills/verify/SKILL.md).  The probe gates every step so a
# wedged tunnel skips cleanly instead of hanging the sequence.
set -u
cd /root/repo

log() { echo "=== $* $(date +%H:%M:%S)"; }

probe() {
  timeout 120 python -c "import jax, jax.numpy as jnp; x = jnp.ones((512, 512)); print('probe ok', float((x @ x).sum()))"
}

run() {
  local mode=$1
  log "bench $mode"
  if ! probe; then log "tunnel wedged before $mode; waiting 300s"; sleep 300; probe || { log "still wedged; skipping $mode"; return 1; }; fi
  BENCH_MODE=$mode BENCH_TIMEOUT=1800 python bench.py
}

log start
run schur
run fused
run kkt
run solve
run nd
run normal
run arrow
run aug
run tf
run mpc
log probes
probe && python tools/normal_probe.py
probe && python tools/nd_probe.py
log done
