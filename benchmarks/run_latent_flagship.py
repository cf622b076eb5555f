"""Recorded latent-inversion trajectory (BASELINE config 4).

The reference's two-stage pipeline (VaeNoPhy/Vaevel pretrain →
VaeLatent2NoPhy latent inversion, VaeLatent2NoPhy_model.py:395-560)
as one driver: pretrain a model-domain VAE on a synthetic model bank,
freeze its decoder, and invert the latent through the acoustic
propagator at the registered `latent_inversion` workload geometry,
logging the standard metrics.jsonl/PNG artifacts via engine.train.

Usage:
    python benchmarks/run_latent_flagship.py --epochs 400 \
        --name latent_r5 --save-dir runs_r5
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=400)
    p.add_argument("--pretrain-epochs", type=int, default=300)
    p.add_argument("--bank", type=int, default=48)
    p.add_argument("--name", default="latent_r5")
    p.add_argument("--save-dir", default="runs_r5")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from physicsbasedfwi2_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    from physicsbasedfwi2_tpu.engine import get_workload, create_engine
    from physicsbasedfwi2_tpu.engine.pretrain import (
        make_model_bank, pretrain_model_vae)
    from physicsbasedfwi2_tpu.engine.train import train

    cfg = get_workload("latent_inversion").replace(
        name=args.name, save_dir=args.save_dir, seed=args.seed)
    print(f"pretraining VAE on a {args.bank}-model bank "
          f"({cfg.nz}x{cfg.nx}) ...", flush=True)
    bank = make_model_bank(args.bank, cfg.nz, cfg.nx, water_rows=6,
                           seed=args.seed + 3)
    net, params, norm, hist = pretrain_model_vae(
        bank, latent_dim=cfg.latent_dim, filters=cfg.filters,
        epochs=args.pretrain_epochs, batch_size=8, lr=2e-3)
    print(f"pretrain recon loss {hist[0]:.4f} -> {hist[-1]:.4f}",
          flush=True)
    eng = create_engine(cfg, decoder_params=params, decoder_net=net,
                        decoder_norm=norm)
    train(cfg, epochs=args.epochs, engine=eng)


if __name__ == "__main__":
    main()
