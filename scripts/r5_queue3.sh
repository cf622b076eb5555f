#!/bin/bash
# Round-5 evidence queue v3: the final robust recipe (2.5 Hz ladder +
# step_cap with final-stage release + loss_H guard).  Sequential
# single-chip runs; survives the driver session (launch via setsid).
cd /root/repo
mkdir -p runs_r5
LOG=runs_r5/queue3.log
PY="python -m physicsbasedfwi2_tpu.engine.train"
step() { echo "[queue3 $(date +%H:%M:%S)] $*" >> "$LOG"; }

# 1-3) seed sweep at the registered robust recipe (gate <=0.6x)
for S in 1 2 0; do
  step "start el_final_s$S"
  timeout 2400 $PY --workload marmousi_elastic_robust \
    --dataroot dataroots/marm_elastic_kd \
    --epochs 1500 --seed $S --name el_final_s$S --save-dir runs_r5 \
    >> "$LOG" 2>&1
  step "done el_final_s$S rc=$?"
done

# 4) crime-free: obs simulated with the split-PML reference scheme,
#    inverted with the fast sponge scheme, same recipe
step "start el_crimefree_final"
timeout 2400 $PY --workload marmousi_elastic_robust \
  --dataroot dataroots/marm_elastic_kd_ref \
  --epochs 1500 --seed 0 --name el_crimefree_final --save-dir runs_r5 \
  >> "$LOG" 2>&1
step "done el_crimefree_final rc=$?"

# 5) SEAM with the cap+guard recipe (its ladder already starts at 2 Hz)
step "start seam_final"
timeout 2400 $PY --workload seam_elastic_robust \
  --dataroot dataroots/seam_elastic_kd \
  --epochs 1500 --seed 0 --name seam_final --save-dir runs_r5 \
  >> "$LOG" 2>&1
step "done seam_final rc=$?"

# 6) elastic under the reference's density condition: 3-field rho head
#    on the STANDARD tree (Gardner-rho obs, smoothed rho start)
step "start el_rho_final"
timeout 5400 $PY --workload marmousi_elastic_rho \
  --dataroot dataroots/marm_elastic \
  --set tether_weight=0.0 --set phase_reset_opt=True \
  --set "freq_stages=(2.5,4.0,6.0,8.0,10.0,15.0,20.0)" \
  --set step_cap=1.0 --set step_cap_final=0.0 \
  --set holdout_shots=3 --set holdout_every=10 \
  --set guard_patience=2 --set guard_tol=1.05 --set guard_lr_ramp=30 \
  --epochs 3000 --seed 0 --name el_rho_final --save-dir runs_r5 \
  >> "$LOG" 2>&1
step "done el_rho_final rc=$?"

# 7) acoustic optimizer-study arms (round-3 task #3 full scope)
step "start adam_vs_lbfgs acoustic"
timeout 3600 python benchmarks/adam_vs_lbfgs.py --budget 7000 \
  --acoustic --only acoustic \
  > runs_r5/adam_vs_lbfgs_acoustic.jsonl 2>> "$LOG"
step "done adam_vs_lbfgs acoustic rc=$?"

# 8) MCDIP UQ at flagship budget + 20-realization posterior
step "start mcdip_final"
timeout 5400 $PY --workload mcdip_uq_robust \
  --dataroot dataroots/marm_elastic_kd \
  --epochs 3000 --seed 0 --name mcdip_final --save-dir runs_r5 \
  >> "$LOG" 2>&1
step "done mcdip_final train rc=$?"
timeout 2400 python -m physicsbasedfwi2_tpu.engine.test \
  --workload mcdip_uq_robust --dataroot dataroots/marm_elastic_kd \
  --name mcdip_final --save-dir runs_r5 --epoch latest \
  --realization 20 --results-dir runs_r5/mcdip_final_uq \
  >> "$LOG" 2>&1
step "done mcdip_final test rc=$?"

# 9) field-marine end-to-end (SU-ingested obs -> training curve)
step "start realdata_r5"
timeout 3600 $PY --workload real_data --dataroot dataroots/real_marine \
  --epochs 900 --seed 0 --name realdata_r5 --save-dir runs_r5 \
  >> "$LOG" 2>&1
step "done realdata_r5 rc=$?"

# 10) latent-inversion convergence row
step "start latent_r5"
timeout 2400 python benchmarks/run_latent_flagship.py --epochs 400 \
  --name latent_r5 --save-dir runs_r5 >> "$LOG" 2>&1
step "done latent_r5 rc=$?"

# 11) kernel-headroom attribution with recompile distributions
step "start kernel_breakdown"
timeout 7200 python benchmarks/bench_kernel_breakdown.py --compiles 5 \
  > runs_r5/kernel_breakdown_r5.jsonl 2>> "$LOG"
step "done kernel_breakdown rc=$?"

step "queue3 complete"
