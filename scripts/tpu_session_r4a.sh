#!/bin/bash
# Round-4 TPU measurement session A (run ONE of these at a time; each
# attempt is its own process and exits cleanly via bench.py's SIGALRM).
# Usage: bash scripts/tpu_session_r4a.sh 2>&1 | tee /tmp/tpu_r4a.log
set -x
cd /root/repo

# 1. NTT 2^20 with the new default core (constant-geometry flat)
ZKSNAKE_ATTEMPT_ALARM_S=900 timeout 960 python -u bench.py --attempt ntt 20

# 2. NTT 2^20 with the round-3 core (unrolled 2-D) for comparison
ZKSNAKE_NTT_CORE=unrolled ZKSNAKE_ATTEMPT_ALARM_S=900 timeout 960 \
  python -u bench.py --attempt ntt 20

# 3. Groth16 end-to-end at 2^17 — the round-3 crasher; full tracebacks on
JAX_TRACEBACK_FILTERING=off ZKSNAKE_ATTEMPT_ALARM_S=1500 timeout 1560 \
  python -u bench.py --attempt groth16 17
