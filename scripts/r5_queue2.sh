#!/bin/bash
# Round-5 evidence queue, part 2: waits for part 1 (scripts/r5_queue.sh)
# to log "queue complete", then runs the remaining TPU evidence items.
cd /root/repo
LOG=runs_r5/queue2.log
PY="python -m physicsbasedfwi2_tpu.engine.train"
step() { echo "[queue2 $(date +%H:%M:%S)] $*" >> "$LOG"; }

step "waiting for queue 1"
while ! grep -q "queue complete" runs_r5/queue.log 2>/dev/null; do
  sleep 60
done
step "queue 1 done"

# 8) field-marine end-to-end (SU-ingested obs -> training curve)
step "start realdata_r5"
timeout 3600 $PY --workload real_data --dataroot dataroots/real_marine \
  --epochs 900 --seed 0 --name realdata_r5 --save-dir runs_r5 \
  >> "$LOG" 2>&1
step "done realdata_r5 rc=$?"

# 9) latent-inversion convergence row (pretrain VAE -> invert latent)
step "start latent_r5"
timeout 2400 python benchmarks/run_latent_flagship.py --epochs 400 \
  --name latent_r5 --save-dir runs_r5 >> "$LOG" 2>&1
step "done latent_r5 rc=$?"

# 10) kernel-headroom attribution with recompile distributions
step "start kernel_breakdown"
timeout 7200 python benchmarks/bench_kernel_breakdown.py --compiles 5 \
  > runs_r5/kernel_breakdown_r5.jsonl 2>> "$LOG"
step "done kernel_breakdown rc=$?"

step "queue2 complete"
