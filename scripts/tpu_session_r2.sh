#!/bin/bash
# One-shot TPU measurement queue for the round-2 pending items
# (BASELINE.md "round-2 continuation" section; memory: survey-mode-design).
# Run when the axon tunnel is back: bash scripts/tpu_session_r2.sh
# Results land in /tmp/tpu_r2/*.log; summarize into BASELINE.md afterwards.
set -u
cd /root/repo
OUT=/tmp/tpu_r2
mkdir -p "$OUT"

run() { # name timeout cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name: $* (timeout ${to}s)" | tee -a "$OUT/driver.log"
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  echo "=== $name exit $? $(date +%H:%M:%S)" | tee -a "$OUT/driver.log"
}

# 1. pipeline bench, full scale (re-pins per-seed ESS after the grouped-HMC
#    refactor; writes the headline JSON line)
run bench 5400 python bench.py

# 2. SMC P=1000 with the preconditioned recipe (L=3, thr=0.6) — expect well
#    under the 212.6 s round-2 table entry
run smc_p1000 3600 python scripts/bench_smc.py 1000

# 3. survey throughput A/B on the chip (--loop runs batched THEN looped and
#    prints the ratio)
run survey_ab 5400 python examples/demo_survey.py --quick --scenes 4 --loop

# 4. pixelated-source inversion: per-eval cost sweep + the two-stage demo
run inversion_micro 1800 python scripts/bench_inversion.py
run inversion_demo 3600 python examples/demo_inversion.py

echo "all done; logs in $OUT"
