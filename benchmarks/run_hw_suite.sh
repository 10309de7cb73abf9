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
# Usage:  bash benchmarks/run_hw_suite.sh [outdir]
set -u
OUT=${1:-/tmp/hw_suite}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

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
# BEFORE the 16k step, so a relay death costs only the 16k row.
# 1. headline bench (4096^2, writes the driver-format JSON line)
retry bench4096 3 1800 python bench.py
# 1b. A/B: hi-only-triple refinement (skips the one-time ladder extraction);
#     flip bench.py's default if this wins the headline
retry bench4096_c64exact 2 1800 env MAUS_BENCH_C64EXACT=1 python bench.py --no-mfu
# 2. TPU hardware test tier (the 12/12 correctness criterion)
retry tputier 2 2400 env MAUS_TPU_TESTS=1 python -m pytest -m tpu tests/test_tpu.py -q
# 3. large-N end-to-end eig/SVD rows (VERDICT r3 #6; verifies the refinement
#    chunk memory at 8192 via the probe's hbm_peak telemetry)
retry spectral 3 3600 python -u benchmarks/spectral_large_probe.py
# 4. live MFU scorecard -> refresh the committed artifact (adds the fused
#    kernel's canary entry; ~8 min of remote compiles)
retry mfu_live 2 2400 python -u benchmarks/refresh_mfu.py
# 5. the 16384^2 end-to-end solve (round-3 measurement debt) — the risky
#    relay-killer runs LAST; its QR compile should already be banked in the
#    persistent cache from round 3
retry solve16k 6 2400 python -u benchmarks/solve16k_probe.py --n 16384

echo; echo "== results =="
grep -h '"metric"' "$OUT"/bench4096.log "$OUT"/solve16k.log \
  "$OUT"/spectral.log "$OUT"/mfu_live.log 2>/dev/null | tail -12
tail -2 "$OUT"/tputier.log 2>/dev/null
