"""Seed racing with unsupervised selection (fwi-race).

Deep-image-prior FWI is init-sensitive: on the canonical Marmousi
elastic workload, untethered descent inverts from some net seeds and
falls into a data-consistent drift basin from others
(runs_r4/probe_{h,i,j}; docs/RESULTS.md).  Round-5 probes measured
that no within-run mechanism rejects the bad basin early — its
LOW-BAND data fit (train AND held-out) genuinely improves while the
model diverges (runs_r5/el_guard_s1: loss_H 0.279 -> 0.210 while
vp+vs MSE doubles) — but the basins DO separate at depth: the good
basin keeps descending in held-out misfit while the drift basin
floors (measured ~0.17 vs ~0.24-0.25 at matched budget).

So the robust production recipe is a RACE: train K independent seeds
for a probe budget, rank them by their best FINAL-STAGE held-out
misfit (an unsupervised metric; see cfg.holdout_shots), and spend the
remaining budget only on the winner, resumed from its 'selected'
checkpoint.  The reference's counterpart was a human re-running
training scripts and eyeballing snapshots
(trainVelAutoElMar22ModelPhy.sh --continue_train --epoch N); this is
that practice made unsupervised and reproducible.

    fwi-race --workload marmousi_elastic_robust \
        --dataroot dataroots/marm_elastic_kd \
        --seeds 0,1,2 --probe-epochs 1500 --epochs 4500
"""

from __future__ import annotations

import json
import os


def race(cfg, seeds=(0, 1, 2), probe_epochs: int = 1500,
         epochs: int | None = None, quiet: bool = False):
    """Race ``seeds`` for ``probe_epochs`` each, then continue the
    best-held-out-misfit branch to ``epochs``.

    Returns ``(winner_seed, per_seed_summaries, engine, history)``
    where ``history`` is the winner's full epoch history (probe +
    continuation).  Requires ``cfg.holdout_shots > 0`` — the ranking
    metric is the best final-stage ``loss_H``.
    """
    from physicsbasedfwi2_tpu.engine.train import train

    if cfg.holdout_shots <= 0:
        raise ValueError("race() ranks by held-out misfit; the "
                         "workload needs holdout_shots > 0")
    summaries = []
    histories = {}
    for s in seeds:
        c = cfg.replace(seed=int(s), name=f"{cfg.name}_s{s}")
        if not quiet:
            print(f"[race] probing seed {s} for {probe_epochs} epochs")
        _, hist = train(c, epochs=probe_epochs, quiet=quiet)
        fstage = max(r["freq_stage"] for r in hist
                     if r.get("freq_stage") is not None)
        hs = [(r["loss_H"], r["epoch"]) for r in hist
              if "loss_H" in r and r.get("freq_stage") == fstage]
        if not hs:
            raise RuntimeError(
                f"seed {s}: no final-stage loss_H was logged "
                f"(probe_epochs too small for the ladder?)")
        best_h, best_e = min(hs)
        summaries.append({"seed": int(s), "best_loss_H": best_h,
                          "best_epoch": best_e,
                          "final_loss_H": hs[-1][0]})
        histories[int(s)] = hist
        if not quiet:
            print(f"[race] seed {s}: best final-stage loss_H "
                  f"{best_h:.4f} @ epoch {best_e}")
    win = min(summaries, key=lambda r: r["best_loss_H"])
    wseed = win["seed"]
    if not quiet:
        print(f"[race] winner: seed {wseed} "
              f"(loss_H {win['best_loss_H']:.4f})")
    hist = histories[wseed]
    cw = cfg.replace(seed=wseed, name=f"{cfg.name}_s{wseed}")
    eng = None
    if epochs is not None and epochs > probe_epochs:
        # resume the winner from its unsupervised 'selected'
        # checkpoint (the best final-stage loss_H epoch), not from
        # wherever the probe budget happened to stop
        eng, hist2 = train(cw, epochs=epochs, quiet=quiet,
                           continue_from="selected",
                           start_epoch=probe_epochs + 1)
        hist = hist + hist2
    return wseed, summaries, eng, hist


def main(argv=None):
    import argparse

    from physicsbasedfwi2_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    from physicsbasedfwi2_tpu.engine import get_workload

    p = argparse.ArgumentParser(
        description="seed race with unsupervised selection")
    p.add_argument("--workload", required=True)
    p.add_argument("--seeds", default="0,1,2")
    p.add_argument("--probe-epochs", type=int, default=1500)
    p.add_argument("--epochs", type=int, default=None,
                   help="total budget for the winning branch")
    p.add_argument("--name", default=None)
    p.add_argument("--save-dir", default="./checkpoints")
    p.add_argument("--dataroot", default=None)
    p.add_argument("--set", action="append", default=[],
                   metavar="FIELD=VALUE", dest="overrides")
    args = p.parse_args(argv)

    from physicsbasedfwi2_tpu.engine.config import parse_set_overrides
    cfg = get_workload(args.workload,
                       **parse_set_overrides(args.overrides))
    cfg = cfg.replace(name=args.name or f"race_{args.workload}",
                      save_dir=args.save_dir)
    if args.dataroot:
        cfg = cfg.replace(dataroot=args.dataroot)
    seeds = [int(s) for s in args.seeds.split(",") if s != ""]
    wseed, summaries, _, hist = race(
        cfg, seeds=seeds, probe_epochs=args.probe_epochs,
        epochs=args.epochs)
    out = {"winner_seed": wseed, "seeds": summaries,
           "probe_epochs": args.probe_epochs, "epochs": args.epochs}
    path = os.path.join(cfg.save_dir, f"{cfg.name}_race.json")
    os.makedirs(cfg.save_dir, exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
