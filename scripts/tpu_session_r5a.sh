#!/bin/bash
# Round-5 TPU measurement session A: MSM formulation A/Bs + bench cache
# warming. SEQUENTIAL (one JAX/TPU process at a time — CLAUDE.md); each
# attempt is its own subprocess via bench.py --attempt with an internal
# alarm so a slow compile exits cleanly instead of leaving a stale claim.
set -u
cd /root/repo
LOG=${1:-/tmp/tpu_r5a.log}
run() {
  local tag="$1"; shift
  echo "=== $tag ($(date +%H:%M:%S)) ===" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}

# 1. headline baseline re-measure (warms the bench MSM graph)
run msm20_base env ZKSNAKE_ATTEMPT_ALARM_S=700 timeout 720 python -u bench.py --attempt msm 20
# 2-3. remainder-pass + reduced static round budget
run msm20_rem_s125 env ZKSNAKE_MSM_REMAINDER=1 ZKSNAKE_ATTEMPT_ALARM_S=700 timeout 720 python -u bench.py --attempt msm 20
run msm20_rem_s25 env ZKSNAKE_MSM_REMAINDER=1 ZKSNAKE_MSM_RSIGMA=2.5 ZKSNAKE_ATTEMPT_ALARM_S=700 timeout 720 python -u bench.py --attempt msm 20
# 4. rows-gather variant (no remainder)
run msm20_rows env ZKSNAKE_MSM_GATHER=rows ZKSNAKE_ATTEMPT_ALARM_S=700 timeout 720 python -u bench.py --attempt msm 20
# 5. G2 MSM via the dna route (stopgap default on TPU) at 2^17
run g2msm17 timeout 1000 python -u scripts/bench_g2msm.py 17
# 6. montmul microbench: CIOS vs MXU (self-orchestrating subprocesses)
run montmul timeout 1800 python -u scripts/bench_montmul.py 20
# 7. NTT bench warm
run ntt20 env ZKSNAKE_ATTEMPT_ALARM_S=400 timeout 420 python -u bench.py --attempt ntt 20
# 7. first-ever groth16 number (2^12: jnp G2 path, no pallas-G2 compile
# risk). Two passes: a timed-out first pass still persists every graph it
# compiled, so the retry resumes incrementally from the cache.
run groth16_12 env ZKSNAKE_ATTEMPT_ALARM_S=900 timeout 920 python -u bench.py --attempt groth16 12
run groth16_12b env ZKSNAKE_ATTEMPT_ALARM_S=900 timeout 920 python -u bench.py --attempt groth16 12
# 8. plonk 2^13 warm + 2^15 (new ladder top), same two-pass pattern
run plonk13 env ZKSNAKE_ATTEMPT_ALARM_S=600 timeout 620 python -u bench.py --attempt plonk 13
run plonk15 env ZKSNAKE_ATTEMPT_ALARM_S=900 timeout 920 python -u bench.py --attempt plonk 15
run plonk15b env ZKSNAKE_ATTEMPT_ALARM_S=900 timeout 920 python -u bench.py --attempt plonk 15
# 9. bigger groth16 rungs (G2 rides the dna route now) + G2 @ 2^20 profile
run groth16_14 env ZKSNAKE_ATTEMPT_ALARM_S=900 timeout 920 python -u bench.py --attempt groth16 14
run groth16_17 env ZKSNAKE_ATTEMPT_ALARM_S=1200 timeout 1220 python -u bench.py --attempt groth16 17
run groth16_17b env ZKSNAKE_ATTEMPT_ALARM_S=1200 timeout 1220 python -u bench.py --attempt groth16 17
run g2msm20 timeout 1000 python -u scripts/bench_g2msm.py 20
echo "=== session A done ($(date +%H:%M:%S)) ===" >> "$LOG"
