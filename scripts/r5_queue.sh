#!/bin/bash
# Round-5 evidence queue: sequential single-chip TPU runs.
# Run inside tmux so it survives the driver session:
#   tmux new-session -d -s r5q 'bash scripts/r5_queue.sh'
# Progress: tail -f runs_r5/queue.log
cd /root/repo
mkdir -p runs_r5
LOG=runs_r5/queue.log
PY="python -m physicsbasedfwi2_tpu.engine.train"
step() { echo "[queue $(date +%H:%M:%S)] $*" >> "$LOG"; }

# 1-3) seed-robust elastic flagship: 3 seeds to 1500 epochs (gate <=0.6x)
for S in 0 2 1; do
  step "start el_robust_r5_s$S"
  timeout 2400 $PY --workload marmousi_elastic_robust \
    --dataroot dataroots/marm_elastic_kd \
    --epochs 1500 --seed $S --name el_robust_r5_s$S --save-dir runs_r5 \
    >> "$LOG" 2>&1
  step "done el_robust_r5_s$S rc=$?"
done

# 4) crime-free: obs from the split-PML reference scheme, inverted with
#    the fast sponge scheme, same robust recipe
step "start el_crimefree_robust_r5"
timeout 2400 $PY --workload marmousi_elastic_robust \
  --dataroot dataroots/marm_elastic_kd_ref \
  --epochs 1500 --seed 0 --name el_crimefree_robust_r5 --save-dir runs_r5 \
  >> "$LOG" 2>&1
step "done el_crimefree_robust_r5 rc=$?"

# 5) acoustic optimizer-study arms (round-3 task #3 full scope)
step "start adam_vs_lbfgs acoustic"
timeout 3600 python benchmarks/adam_vs_lbfgs.py --budget 7000 \
  --acoustic --only acoustic \
  > runs_r5/adam_vs_lbfgs_acoustic.jsonl 2>> "$LOG"
step "done adam_vs_lbfgs acoustic rc=$?"

# 6) elastic under the reference's density condition: rho-inversion head
#    (3-field net) on the STANDARD tree (Gardner-rho obs, smoothed rho
#    start) with the robust trailing-tether recipe
step "start el_rho_r5"
timeout 5400 $PY --workload marmousi_elastic_rho \
  --dataroot dataroots/marm_elastic \
  --set tether_mode=stage --set tether_refresh_epochs=150 \
  --set phase_reset_opt=True --set holdout_shots=3 --set holdout_every=10 \
  --epochs 3000 --seed 0 --name el_rho_r5 --save-dir runs_r5 \
  >> "$LOG" 2>&1
step "done el_rho_r5 rc=$?"

# 7) MCDIP UQ at flagship budget (VERDICT #10)
step "start mcdip_r5"
timeout 5400 $PY --workload mcdip_uq_robust \
  --dataroot dataroots/marm_elastic_kd \
  --epochs 6000 --seed 0 --name mcdip_r5 --save-dir runs_r5 \
  >> "$LOG" 2>&1
step "done mcdip_r5 rc=$?"

step "queue complete"
