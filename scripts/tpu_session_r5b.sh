#!/bin/bash
# Round-5 TPU session B: MSM formulation sweep around the session-A optimum
# (remainder sigma 2.5 = 395k pts/s) + combined variants. Run AFTER
# session A (one TPU process at a time).
set -u
cd /root/repo
LOG=${1:-/tmp/tpu_r5b.log}
run() {
  local tag="$1"; shift
  echo "=== $tag ($(date +%H:%M:%S)) ===" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}
# defaults now remainder=1 sigma=2.5: this is what the driver bench runs
run msm20_default env ZKSNAKE_ATTEMPT_ALARM_S=700 timeout 720 python -u bench.py --attempt msm 20
# sigma sweep above/below the A-optimum
run msm20_s35 env ZKSNAKE_MSM_RSIGMA=3.5 ZKSNAKE_ATTEMPT_ALARM_S=700 timeout 720 python -u bench.py --attempt msm 20
run msm20_s45 env ZKSNAKE_MSM_RSIGMA=4.5 ZKSNAKE_ATTEMPT_ALARM_S=700 timeout 720 python -u bench.py --attempt msm 20
# rows gather on top of the remainder default
run msm20_rows_rem env ZKSNAKE_MSM_GATHER=rows ZKSNAKE_ATTEMPT_ALARM_S=700 timeout 720 python -u bench.py --attempt msm 20
# MXU montmul inside the bucket kernel (microbench: 137.5M vs 110.3M
# muls/s over CIOS) — full-MSM adoption check, oracle-verified
run msm20_mxu env ZKSNAKE_MXU_MONTMUL=1 ZKSNAKE_ATTEMPT_ALARM_S=700 timeout 720 python -u bench.py --attempt msm 20
echo "=== session B done ($(date +%H:%M:%S)) ===" >> "$LOG"
