#!/bin/bash
# Round-5 TPU measurement sequence.  Run under tmux from /root/repo:
#
#   tmux new -d -s r5 'bash tools/r5_measure.sh 2>&1 | tee -a tools/r5_measure.log'
#
# Every claim ships as a durable artifact (VERDICT r4 "weak #3"): each
# mode's JSON line is written to BENCH_<mode>_r5.json next to the full
# log.  Each engine runs alone in bench.py's guarded subprocess
# (generous timeouts: a timeout kill mid-compile WEDGES the tunnel —
# see .claude/skills/verify/SKILL.md).  The probe gates every step so a
# wedged tunnel skips cleanly instead of hanging the sequence.
set -u
cd /root/repo

log() { echo "=== $* $(date +%H:%M:%S)"; }

probe() {
  timeout 120 python -c "import jax, jax.numpy as jnp; x = jnp.ones((512, 512)); print('probe ok', float((x @ x).sum()))"
}

run() {
  local name=$1; shift
  log "bench $name"
  if ! probe; then log "tunnel wedged before $name; waiting 300s"; sleep 300; probe || { log "still wedged; skipping $name"; return 1; }; fi
  local out
  out=$(env "$@" BENCH_TIMEOUT=1800 python bench.py)
  echo "$out"
  local json
  json=$(echo "$out" | grep '^{' | tail -1)
  if [ -n "$json" ]; then
    echo "$json" > "BENCH_${name}_r5.json"
  else
    log "NO JSON for $name"
  fi
}

log start
run fused BENCH_MODE=fused
# escalation check (VERDICT r4 #7): the tol-1e-5 line next to the 1e-6
# headline — the r3 record at 1e-5 was 29.8M it/s
run fused_tol1e5 BENCH_MODE=fused BENCH_TOL=1e-5
run solve BENCH_MODE=solve
run steps BENCH_MODE=steps
run tf BENCH_MODE=tf
run normal BENCH_MODE=normal
run aug BENCH_MODE=aug
run schur BENCH_MODE=schur
run kkt BENCH_MODE=kkt
run nd BENCH_MODE=nd
run arrow BENCH_MODE=arrow
run mpc BENCH_MODE=mpc
run sharded BENCH_MODE=sharded
log done
