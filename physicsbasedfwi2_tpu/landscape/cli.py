"""Loss-surface CLI — the reference's plot_surface2.py role.

    python -m physicsbasedfwi2_tpu.landscape.cli \
        --workload marmousi_acoustic --small --x=-1:1:11 --y=-1:1:11

Loads (or initializes) the workload's engine, sweeps the physics
data-misfit over two filter-normalized directions, writes the surface
as .npz and a contour PNG, and reports extreme Hessian eigenvalues —
replacing mpirun + h5py + vtp export with one jit-batched sweep.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _parse_range(s: str):
    lo, hi, n = s.split(":")
    return np.linspace(float(lo), float(hi), int(n))


def main(argv=None):
    from physicsbasedfwi2_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--workload", default="marmousi_acoustic")
    p.add_argument("--name", default="landscape")
    p.add_argument("--epoch", default=None,
                   help="checkpoint tag to load (default: fresh init)")
    p.add_argument("--x", default="-1:1:11")
    p.add_argument("--y", default="-1:1:11")
    p.add_argument("--norm", default="filter", choices=["filter", "layer"])
    p.add_argument("--hessian", action="store_true",
                   help="also estimate extreme Hessian eigenvalues")
    p.add_argument("--vtp", action="store_true",
                   help="also export a ParaView .vtp surface "
                        "(reference h52vtp.py)")
    p.add_argument("--h5", action="store_true",
                   help="also export the reference's .h5 surface "
                        "layout (xcoordinates/ycoordinates/"
                        "train_loss, plot_surface2.py)")
    p.add_argument("--vtp-log", action="store_true",
                   help="log-transform the .vtp z values")
    p.add_argument("--vtp-zmax", type=float, default=-1.0,
                   help="clip .vtp z values above this")
    p.add_argument("--out", default="./results/landscape")
    p.add_argument("--save-dir", default="./checkpoints")
    p.add_argument("--small", action="store_true")
    p.add_argument("--trajectory", default=None, metavar="CKPT_DIR",
                   help="directory of epoch-tagged *_net_G.npz "
                        "checkpoints: compute the surface in the "
                        "trajectory's top-2 PCA plane centered on "
                        "the final checkpoint and overlay the "
                        "projected path (reference plot_trajectory."
                        "py + projection.py)")
    p.add_argument("--dataroot", default=None,
                   help="on-disk npy tree for the workload (surface "
                        "of a run trained on real data must be "
                        "evaluated against the same data)")
    p.add_argument("--set", action="append", default=[],
                   metavar="FIELD=VALUE", dest="overrides",
                   help="override any config field (fwi-train "
                        "syntax)")
    args = p.parse_args(argv)

    import jax.numpy as jnp
    from physicsbasedfwi2_tpu.engine import get_workload, create_engine
    from physicsbasedfwi2_tpu.landscape import (
        loss_surface_2d, lanczos_extreme_eigs)
    from physicsbasedfwi2_tpu.models import apply_velocity_output
    from physicsbasedfwi2_tpu.ops import simulate_acoustic, trace_normalize

    cfg = get_workload(args.workload).replace(save_dir=args.save_dir)
    if args.dataroot:
        cfg = cfg.replace(dataroot=args.dataroot)
    if args.overrides:
        from physicsbasedfwi2_tpu.engine.config import (
            parse_set_overrides)
        cfg = cfg.replace(**parse_set_overrides(args.overrides))
    is_elastic = cfg.engine == "elastic_dip"
    if args.small:
        small = dict(nz=48, nx=64, nt=300, num_shots=4,
                     num_receivers=32, filters=(4, 8, 16),
                     chunk=25, water_rows=6)
        if is_elastic:
            small.update(nt=160, dt=0.0015, num_receivers=20,
                         shots_per_iter=2, water_rows=4, pml_width=12)
        cfg = cfg.replace(**small)
    eng = create_engine(cfg)
    if args.epoch:
        eng.load_networks(args.epoch)

    wl = eng.wl

    # observed gathers / net inputs ride in the `data` argument of
    # the sweep jit — closed over, they would be serialized into the
    # HLO as literal constants (CLAUDE.md rule)
    if is_elastic:
        # the reference's `elasticnet` surface (loss.sh/loss3.sh:
        # evaluation.eval_loss3 runs the elastic net end-to-end and
        # returns loss_D_MSE over the MarmousiEl npy's)
        from physicsbasedfwi2_tpu.models import apply_elastic_output
        idx = jnp.arange(cfg.shots_per_iter or cfg.num_shots)
        data = {"in_vx": eng.in_vx, "in_vz": eng.in_vz,
                "lowf": eng.lowf, "true_m": eng.true_m,
                "phys": eng._stage_pack(cfg.freq_stages[0]
                                        if cfg.freq_stages else 0.0)}

        def physics_loss(params, data):
            deltas, _ = eng.net.apply(params, data["in_vx"],
                                      data["in_vz"],
                                      deterministic=True)
            m = apply_elastic_output(
                deltas, data["lowf"], data["true_m"],
                delta_scale=eng.delta_scale, clip_min=eng.clip_min,
                clip_max=eng.clip_max, pin_rows=cfg.water_rows)
            return eng._physics_loss_raw(m[0], idx, data["phys"])
    else:
        data = {"shots_in": eng.shots_in, "true_b": eng.true_b,
                "obs_norm": wl.obs_norm}

        def physics_loss(params, data):
            out = eng._apply_net(params, shots_in=data["shots_in"])
            vp = apply_velocity_output(out.field, data["true_b"],
                                       water_vel=cfg.water_vel)[0, :, :, 0]
            pred = simulate_acoustic(vp, wl.wavelet, *wl.geom, wl.cfg)
            return jnp.mean((trace_normalize(pred)
                             - data["obs_norm"]) ** 2)

    xs, ys = _parse_range(args.x), _parse_range(args.y)
    traj_coords = epoch_tags = None
    d1 = d2 = None
    if args.trajectory:
        from physicsbasedfwi2_tpu.landscape.projection import (
            trajectory_pca, unflatten_like, load_checkpoint_series)
        import jax as _jax
        epoch_tags, series = load_checkpoint_series(args.trajectory,
                                                    eng.params)
        coords, explained, comps = trajectory_pca(series)
        print(f"[trajectory] {len(series)} checkpoints "
              f"(epochs {epoch_tags[0]}..{epoch_tags[-1]}), PCA "
              f"explained ratio {explained[0]:.2f}/{explained[1]:.2f}")
        # surface in the PCA plane, centered on the FINAL checkpoint
        # (the reference's plot_surface --dir_file=PCA convention)
        eng.params = _jax.tree_util.tree_map(jnp.asarray, series[-1])
        d1 = unflatten_like(comps[0], eng.params)
        d2 = unflatten_like(comps[1], eng.params)
        traj_coords = coords
        # default ranges hug the trajectory extent (20% margin)
        if args.x == "-1:1:11" and args.y == "-1:1:11":
            pad = 0.2
            sx = max(1e-8, coords[:, 0].max() - coords[:, 0].min())
            sy = max(1e-8, coords[:, 1].max() - coords[:, 1].min())
            xs = np.linspace(coords[:, 0].min() - pad * sx,
                             coords[:, 0].max() + pad * sx, len(xs))
            ys = np.linspace(coords[:, 1].min() - pad * sy,
                             coords[:, 1].max() + pad * sy, len(ys))
    surf, d1, d2 = loss_surface_2d(physics_loss, eng.params,
                                   xs=xs, ys=ys, norm=args.norm,
                                   d1=d1, d2=d2, data=data)
    os.makedirs(args.out, exist_ok=True)
    extra = ({"traj_coords": traj_coords,
              "traj_epochs": np.asarray(epoch_tags)}
             if traj_coords is not None else {})
    np.savez(os.path.join(args.out, f"{args.name}_surface.npz"),
             losses=surf, xs=xs, ys=ys, **extra)
    if args.h5:
        # reference surface-file layout (plot_surface2.py stores
        # xcoordinates/ycoordinates + a <surf_name> dataset that
        # h52vtp.py:30-60 reads back) so reference-era ParaView /
        # plot_2D tooling can consume surfaces computed here
        import h5py
        with h5py.File(os.path.join(
                args.out, f"{args.name}_surface.h5"), "w") as f:
            f["xcoordinates"] = xs
            f["ycoordinates"] = ys
            f["train_loss"] = surf
    if args.vtp:
        from physicsbasedfwi2_tpu.landscape.vtp import surface_to_vtp
        surface_to_vtp(
            os.path.join(args.out, f"{args.name}_surface.vtp"),
            surf, xs, ys, log=args.vtp_log, zmax=args.vtp_zmax)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(5, 4))
        cs = ax.contourf(xs, ys, np.log10(surf + 1e-20), levels=20)
        fig.colorbar(cs, ax=ax, label="log10 loss")
        if traj_coords is not None:
            ax.plot(traj_coords[:, 0], traj_coords[:, 1], "w.-",
                    lw=1.2, ms=4)
            ax.annotate(str(epoch_tags[0]), traj_coords[0],
                        color="w", fontsize=8)
            ax.annotate(str(epoch_tags[-1]), traj_coords[-1],
                        color="w", fontsize=8)
            ax.set_xlabel("PCA 1")
            ax.set_ylabel("PCA 2")
        else:
            ax.set_xlabel("d1")
            ax.set_ylabel("d2")
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, f"{args.name}_surface.png"),
                    dpi=110)
    except Exception:
        pass

    result = {"min": float(surf.min()), "max": float(surf.max()),
              "center": float(surf[len(ys) // 2, len(xs) // 2])}
    if args.hessian:
        lo, hi, _ = lanczos_extreme_eigs(physics_loss, eng.params,
                                         steps=10, data=data)
        result["eig_min"] = lo
        result["eig_max"] = hi
    print(json.dumps(result))


if __name__ == "__main__":
    main()
