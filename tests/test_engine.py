"""Engine layer: every engine family trains a step and improves or at
least produces finite losses; drivers, checkpointing, MC sampling."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from physicsbasedfwi2_tpu.engine import (
    ExperimentConfig, get_workload, list_workloads, create_engine,
)
from physicsbasedfwi2_tpu.engine.train import train, PlateauDetector
from physicsbasedfwi2_tpu.engine.test import evaluate


SMALL_AC = dict(nz=40, nx=48, nt=400, dt=0.001, num_shots=4,
                num_receivers=24, filters=(4, 8, 16), chunk=25,
                water_rows=6, pml_width=12)
SMALL_EL = dict(nz=36, nx=48, nt=160, dt=0.0015, num_shots=4,
                num_receivers=20, filters=(4, 8, 16), chunk=25,
                water_rows=4, shots_per_iter=2, pml_width=12)


def test_workload_registry():
    names = list_workloads()
    for required in ("marmousi_acoustic", "marmousi_elastic",
                     "marmousi_elastic_lbfgs", "latent_inversion",
                     "seam_elastic", "mcdip_uq", "classic_fwi_acoustic",
                     "pix2pix_baseline", "unet_ssim_baseline"):
        assert required in names, required


def test_acoustic_dip_engine_trains():
    cfg = get_workload("marmousi_acoustic", **SMALL_AC).replace(
        name="t_ac", save_dir="/tmp/fwi_test_ck", lstart=0)
    eng = create_engine(cfg)
    losses = [eng.optimize_parameters(epoch=e)[
        "loss_D"] for e in range(1, 6)]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    val, img = eng.test()
    assert np.isfinite(val["loss_V_MSE"]) and img.shape == (40, 48)
    # save/load roundtrip
    eng.save_networks("latest")
    eng2 = create_engine(cfg)
    eng2.load_networks("latest")
    v2, _ = eng2.test()
    assert abs(v2["loss_V_MSE"] - val["loss_V_MSE"]) < 1e-3


def test_elastic_dip_engine_trains():
    cfg = get_workload("marmousi_elastic", **SMALL_EL).replace(
        name="t_el", save_dir="/tmp/fwi_test_ck")
    eng = create_engine(cfg)
    r1 = eng.optimize_parameters(epoch=1, freq=12.0)
    r2 = eng.optimize_parameters(epoch=2, freq=12.0)
    assert np.isfinite(r1["loss_D_MSE"]) and np.isfinite(r2["loss_D_MSE"])
    val, m = eng.test()
    assert m.shape == (36, 48, 2)


def test_mcdip_realizations_differ():
    cfg = get_workload("mcdip_uq", **SMALL_EL).replace(
        name="t_mc", save_dir="/tmp/fwi_test_ck")
    eng = create_engine(cfg)
    samples = eng.mc_realizations(3)
    assert samples.shape[0] == 3
    assert samples.std(axis=0).mean() > 0  # dropout variability


def test_classic_fwi_engine():
    cfg = get_workload("classic_fwi_acoustic", **SMALL_AC).replace(
        name="t_cl", save_dir="/tmp/fwi_test_ck", lr=5.0)
    eng = create_engine(cfg)
    losses = [eng.optimize_parameters(e)["loss_D_MSE"] for e in range(10)]
    assert all(np.isfinite(losses))
    assert min(losses[1:]) < losses[0]


def test_latent_inversion_engine():
    cfg = get_workload("latent_inversion", **SMALL_AC).replace(
        name="t_lat", save_dir="/tmp/fwi_test_ck", lr=0.05)
    eng = create_engine(cfg)
    losses = [eng.optimize_parameters(e)["loss_D_MSE"] for e in range(4)]
    assert all(np.isfinite(losses))


def test_supervised_engine_gan_and_ssim():
    cfg = get_workload("pix2pix_baseline").replace(
        name="t_gan", save_dir="/tmp/fwi_test_ck")
    eng = create_engine(cfg, in_shape=(32, 32))
    a = jnp.zeros((1, 32, 32, 1))
    b = jnp.ones((1, 32, 32, 1)) * 0.5
    r = eng.optimize_parameters(a, b)
    assert np.isfinite(r["loss_G"]) and np.isfinite(r["loss_D"])
    cfg2 = get_workload("unet_ssim_baseline").replace(
        name="t_ssim", save_dir="/tmp/fwi_test_ck")
    eng2 = create_engine(cfg2, in_shape=(32, 32))
    r2 = eng2.optimize_parameters(a, b)
    assert np.isfinite(r2["loss_G"]) and "loss_D" not in r2


def test_train_driver_and_plateau():
    pd = PlateauDetector(history=3, eps=1e-3)
    assert not pd.update(1.0)
    assert not pd.update(1.0)
    assert pd.update(1.0)  # constant -> plateau

    cfg = get_workload("marmousi_acoustic", **SMALL_AC).replace(
        name="t_drv", save_dir="/tmp/fwi_test_ck", save_epoch_freq=2)
    eng, hist = train(cfg, epochs=2, quiet=True)
    assert len(hist) == 2
    assert os.path.exists("/tmp/fwi_test_ck/t_drv/loss_log.txt")
    assert os.path.exists("/tmp/fwi_test_ck/t_drv/latest_net_G.pkl")


def test_eval_driver_with_mc():
    cfg = get_workload("mcdip_uq", **SMALL_EL).replace(
        name="t_ev", save_dir="/tmp/fwi_test_ck")
    res = evaluate(cfg, realizations=3, results_dir="/tmp/fwi_test_res")
    assert res["realizations"] == 3
    assert np.isfinite(res["mc_std_mean"])


def test_orbax_full_state_checkpoint():
    from physicsbasedfwi2_tpu.engine.checkpoint import (
        save_engine, restore_engine)
    cfg = get_workload("marmousi_acoustic", **SMALL_AC).replace(
        name="t_orb", save_dir="/tmp/fwi_test_ck")
    eng = create_engine(cfg)
    eng.optimize_parameters(1)
    save_engine(eng, "/tmp/fwi_test_ck/orbax_state", epoch=1)
    eng2 = create_engine(cfg)
    ep = restore_engine(eng2, "/tmp/fwi_test_ck/orbax_state")
    assert ep == 1
    v1, _ = eng.test()
    v2, _ = eng2.test()
    assert abs(v1["loss_V_MSE"] - v2["loss_V_MSE"]) < 1e-3


def test_cyclegan_engine():
    from physicsbasedfwi2_tpu.engine.cyclegan import CycleGanEngine
    eng = CycleGanEngine(in_shape=(32, 32), base=8, n_blocks=2)
    a = jnp.zeros((1, 32, 32, 1))
    b = jnp.ones((1, 32, 32, 1)) * 0.3
    r = eng.optimize_parameters(a, b)
    assert np.isfinite(r["loss_G"]) and np.isfinite(r["loss_D"])
    assert eng.translate(a).shape == (1, 32, 32, 1)


def test_engine_from_dataroot(tmp_path):
    """An npy tree written in the reference's contract trains the
    engine directly (the 'switch from the reference' path)."""
    from physicsbasedfwi2_tpu.data import SyntheticAcousticWorkload
    from physicsbasedfwi2_tpu.data.synthetic import write_npy_tree
    wl = SyntheticAcousticWorkload.build(
        nz=40, nx=48, nt=400, dt=0.001, num_shots=4, num_receivers=24,
        water_rows=6, chunk=25, pml_width=12)
    write_npy_tree(str(tmp_path), wl)
    cfg = get_workload("marmousi_acoustic", **SMALL_AC).replace(
        name="t_dr", save_dir="/tmp/fwi_test_ck",
        dataroot=str(tmp_path))
    eng = create_engine(cfg)
    np.testing.assert_allclose(np.asarray(eng.wl.obs), np.asarray(wl.obs),
                               rtol=1e-6)
    r = eng.optimize_parameters(1)
    assert np.isfinite(r["loss_D"])


def test_continue_train_and_opt_dump(tmp_path):
    cfg = get_workload("marmousi_acoustic", **SMALL_AC).replace(
        name="t_res", save_dir=str(tmp_path), save_epoch_freq=2)
    eng, h1 = train(cfg, epochs=2, quiet=True)
    v1, _ = eng.test()
    # resume from latest
    eng2, h2 = train(cfg, epochs=3, quiet=True,
                     continue_from="latest", start_epoch=3)
    assert h2[0]["epoch"] == 3
    assert os.path.exists(os.path.join(str(tmp_path), "t_res",
                                       "train_opt.txt"))
    txt = open(os.path.join(str(tmp_path), "t_res",
                            "train_opt.txt")).read()
    assert "netG: Auto22" in txt


def test_diagnostics():
    from physicsbasedfwi2_tpu.utils import diagnose_params, is_legal, grad_norms
    tree = {"a": jnp.ones((3,)), "b": {"c": jnp.zeros((2, 2))}}
    assert is_legal(tree)
    assert not is_legal({"a": jnp.asarray([jnp.nan])})
    s = diagnose_params(tree)
    assert "finite=True" in s
    n = grad_norms(tree)
    assert any("a" in k for k in n)


def test_elastic_engine_from_dataroot(tmp_path):
    from physicsbasedfwi2_tpu.data import SyntheticElasticWorkload
    from physicsbasedfwi2_tpu.data.synthetic import write_elastic_npy_tree
    wl = SyntheticElasticWorkload.build(
        nz=36, nx=48, nt=160, dt=0.0015, num_shots=4, num_receivers=20,
        water_rows=4, chunk=25, pml_width=12)
    write_elastic_npy_tree(str(tmp_path), wl)
    cfg = get_workload("marmousi_elastic", **SMALL_EL).replace(
        name="t_eldr", save_dir="/tmp/fwi_test_ck",
        dataroot=str(tmp_path))
    eng = create_engine(cfg)
    np.testing.assert_allclose(np.asarray(eng.wl.obs_vx),
                               np.asarray(wl.obs_vx), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(eng.wl.true["vp"]),
                               np.asarray(wl.true["vp"]), rtol=1e-4)
    r = eng.optimize_parameters(1, freq=12.0)
    assert np.isfinite(r["loss_D_MSE"])
