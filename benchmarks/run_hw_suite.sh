#!/usr/bin/env bash
# Hardware measurement suite — run when a TPU chip is attached.
#
# Every step is retry-hardened: the remote compile helper gets OOM-SIGKILLed
# on most 16384^2 QR compile attempts, and the persistent compilation cache
# (enabled in-code by bench.py / the probes) banks each successful compile so
# retries converge. After a helper SIGKILL the backend can sit UNAVAILABLE
# for minutes — hence the sleep between attempts. Run JOBS SOLO: two
# processes sharing the chip corrupt each other's runs, and local load can
# matter during remote compiles.
#
# Round-5 change (VERDICT r4 #5): the default outdir is a COMMITTED results
# directory — the round-4 logs lived in /tmp and did not survive, leaving
# BASELINE.md's "Measured by" column pointing at dead paths. Commit
# benchmarks/results/r5/ after the run.
#
# Usage:  bash benchmarks/run_hw_suite.sh [outdir]
set -u
OUT=${1:-benchmarks/results/r5}
cd "$(dirname "$0")/.."
mkdir -p "$OUT"

retry () {  # retry <name> <max_attempts> <timeout_s> <cmd...>
  local name=$1 max=$2 tmo=$3; shift 3
  for i in $(seq 1 "$max"); do
    echo "=== $name attempt $i ===" | tee -a "$OUT/$name.log"
    if timeout "$tmo" "$@" >> "$OUT/$name.log" 2>&1; then
      echo "--- $name OK (attempt $i)"; return 0
    fi
    echo "--- $name failed attempt $i (rc=$?)"; sleep 30
  done
  echo "--- $name FAILED after $max attempts"; return 1
}

# Ordering note: 16384^2 QR compile attempts are what OOM-SIGKILL the remote
# compile helper and (after several) take down the tunnel relay for the rest
# of the session (round-3 outage). Everything cheaper/safer therefore runs
# BEFORE the 16k steps, so a relay death costs only the 16k rows.
# 0. live MFU scorecard + canary calibration -> refresh the committed
#    artifact FIRST: bench.py's drift gates read canary_calibration, so the
#    artifact must be from the same library/session (VERDICT r4 #1)
retry mfu_live 2 2400 python -u benchmarks/refresh_mfu.py
# 1. headline bench (4096^2, writes the driver-format JSON line)
retry bench4096 3 1800 python bench.py
# 2. TPU hardware test tier (the 12/12 correctness criterion) on HEAD
retry tputier 2 2400 env MAUS_TPU_TESTS=1 python -m pytest -m tpu tests/test_tpu.py -q
# 3. large-N end-to-end eig/SVD rows (VERDICT r4 #2: first post-fix on-chip
#    measurement; also verifies refinement-chunk memory via hbm_peak)
retry spectral 3 3600 python -u benchmarks/spectral_large_probe.py
# 4. AGE + scenario-suite rows (VERDICT r4 #4: BASELINE rows 2 and 10)
retry age 2 2400 python -u benchmarks/age_probe.py
# 5. the 16384^2 end-to-end solve — the risky relay-killer steps run LAST;
#    the QR compile should already be banked in the persistent cache
retry solve16k 6 2400 python -u benchmarks/solve16k_probe.py --n 16384
# 6. forced host-refactor handoff on hardware (VERDICT r4 #6). High kappa
#    alone CANNOT fire it (harder problems exit the evolve phase earlier and
#    a backward-stable QR never returns non-finite iterates); the production
#    trigger is a declared-HPD operand with an indefinite defect, whose
#    shared Cholesky is NaN until the Psi rung exceeds |lambda_min| — see
#    benchmarks/handoff_probe.py
retry handoff 3 2400 python -u benchmarks/handoff_probe.py --n 12288

echo; echo "== results =="
grep -h '"metric"' "$OUT"/bench4096.log "$OUT"/solve16k.log "$OUT"/handoff.log \
  "$OUT"/spectral.log "$OUT"/age.log "$OUT"/mfu_live.log 2>/dev/null | tail -16
tail -2 "$OUT"/tputier.log 2>/dev/null
