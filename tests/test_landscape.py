"""Loss-landscape side-car: surfaces, Hessian eigs, trajectory PCA."""

import jax
import jax.numpy as jnp
import numpy as np

from physicsbasedfwi2_tpu.landscape import (
    filter_normalized_direction, perturb_params, loss_surface_2d,
    hvp, lanczos_extreme_eigs, trajectory_pca,
)


def quad_loss(A):
    def loss(p):
        x = p["w"].ravel()
        return 0.5 * x @ A @ x
    return loss


def test_filter_normalized_direction_norms():
    params = {"conv": jnp.ones((3, 3, 2, 4)), "b": jnp.ones((4,))}
    d = filter_normalized_direction(params, jax.random.PRNGKey(0))
    # per-output-filter norms of d match those of w
    w, dv = np.asarray(params["conv"]), np.asarray(d["conv"])
    for c in range(4):
        np.testing.assert_allclose(
            np.linalg.norm(dv[..., c]), np.linalg.norm(w[..., c]),
            rtol=1e-5)


def test_loss_surface_quadratic_min_at_center():
    A = jnp.eye(4) * jnp.asarray([1.0, 2.0, 3.0, 4.0])
    loss = quad_loss(A)
    params = {"w": jnp.zeros((2, 2))}  # the minimum
    surf, d1, d2 = loss_surface_2d(
        loss, params, xs=np.linspace(-1, 1, 5), ys=np.linspace(-1, 1, 5),
        norm="layer", batch=5)
    assert surf.shape == (5, 5)
    assert surf[2, 2] <= surf.min() + 1e-6  # center is the min


def test_hvp_and_lanczos_quadratic():
    diag = jnp.asarray([0.5, 1.0, 2.0, 10.0])
    A = jnp.diag(diag)
    loss = quad_loss(A)
    params = {"w": jnp.ones((2, 2))}
    v = {"w": jnp.asarray([[1.0, 0.0], [0.0, 0.0]])}
    h = hvp(loss, params, v)
    np.testing.assert_allclose(np.asarray(h["w"]).ravel(),
                               [0.5, 0, 0, 0], atol=1e-6)
    lo, hi, ritz = lanczos_extreme_eigs(loss, params, steps=8)
    assert abs(hi - 10.0) < 1e-3
    assert abs(lo - 0.5) < 1e-3


def test_trajectory_pca():
    traj = [{"w": jnp.asarray([float(i), 0.0, 0.0])} for i in range(5)]
    coords, explained, comps = trajectory_pca(traj)
    assert coords.shape == (5, 2)
    assert explained[0] > 0.99  # 1D trajectory


def test_loss_surface_sharded_matches_single():
    """Multi-chip sweep (the mpi4py crunch2 replacement) equals the
    single-chip vmap sweep."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from physicsbasedfwi2_tpu.landscape import (
        loss_surface_2d, loss_surface_2d_sharded)
    from physicsbasedfwi2_tpu.parallel import make_mesh

    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}

    def loss_fn(p):
        return jnp.sum(p["w"] ** 2) + jnp.sum((p["b"] - 1.0) ** 2)

    key = jax.random.PRNGKey(3)
    xs = np.linspace(-1, 1, 5)
    ys = np.linspace(-1, 1, 5)
    s1, d1, d2 = loss_surface_2d(loss_fn, params, key=key, xs=xs, ys=ys)
    mesh = make_mesh(min(8, len(jax.devices())))
    s2, _, _ = loss_surface_2d_sharded(loss_fn, params, mesh,
                                       d1=d1, d2=d2, xs=xs, ys=ys)
    np.testing.assert_allclose(s2, s1, rtol=1e-5, atol=1e-6)


def test_landscape_cli_acoustic_and_elastic(tmp_path):
    """The plot_surface2.py-role CLI sweeps both net families
    (loss.sh `adjointnet` / loss3.sh `elasticnet`) and writes the
    surface artifacts."""
    import json
    import io
    import os
    from contextlib import redirect_stdout
    from physicsbasedfwi2_tpu.landscape.cli import main

    for wl in ("marmousi_acoustic", "marmousi_elastic"):
        buf = io.StringIO()
        with redirect_stdout(buf):
            main(["--workload", wl, "--small", "--name", f"t_{wl}",
                  "--x=-0.3:0.3:3", "--y=-0.3:0.3:3", "--vtp", "--h5",
                  "--out", str(tmp_path)])
        out = json.loads(buf.getvalue().strip().splitlines()[-1])
        assert np.isfinite(out["min"]) and out["max"] >= out["min"]
        assert os.path.exists(tmp_path / f"t_{wl}_surface.npz")
        assert os.path.exists(tmp_path / f"t_{wl}_surface.vtp")
        # reference .h5 layout (plot_surface2.py / h52vtp.py keys)
        import h5py
        with h5py.File(tmp_path / f"t_{wl}_surface.h5") as f:
            assert f["train_loss"].shape == (3, 3)
            assert f["xcoordinates"].shape == (3,)


def test_vtp_export_geometry(tmp_path):
    """surface_to_vtp writes a valid VTK-XML PolyData quad mesh with
    the reference exporter's structure (h52vtp.py:30-259): ny*nx
    points at (x, y, z), (ny-1)*(nx-1) quads, point + cell scalars,
    log/zmax transforms."""
    import xml.etree.ElementTree as ET
    from physicsbasedfwi2_tpu.landscape import surface_to_vtp

    xs = np.linspace(-1, 1, 4)
    ys = np.linspace(-2, 2, 3)
    losses = np.arange(12, dtype=np.float64).reshape(3, 4) + 1.0
    path = surface_to_vtp(str(tmp_path / "s.vtp"), losses, xs, ys,
                          log=True, zmax=10.0)

    root = ET.parse(path).getroot()
    piece = root.find("PolyData/Piece")
    assert int(piece.get("NumberOfPoints")) == 12
    assert int(piece.get("NumberOfPolys")) == 6
    pts = np.fromstring(
        piece.find("Points/DataArray").text.replace("\n", " "),
        sep=" ").reshape(12, 3)
    # z = log(min(loss, 10) + 0.1), row-major over (ys, xs)
    want_z = np.log(np.minimum(losses, 10.0) + 0.1).ravel()
    np.testing.assert_allclose(pts[:, 2], want_z, rtol=1e-6)
    np.testing.assert_allclose(pts[:4, 0], xs, rtol=1e-6)
    conn = np.fromstring(
        piece.find("Polys/DataArray[@Name='connectivity']")
        .text.replace("\n", " "), sep=" ").astype(int).reshape(6, 4)
    assert conn.min() == 0 and conn.max() == 11
    # every quad's corners are two horizontally-adjacent point pairs
    # one grid row apart
    assert (conn[:, 1] - conn[:, 0] == 1).all()
    assert (conn[:, 3] - conn[:, 0] == 4).all()
    zvals = np.fromstring(
        piece.find("PointData/DataArray").text.replace("\n", " "),
        sep=" ")
    np.testing.assert_allclose(zvals, want_z, rtol=1e-6)
    cell = np.fromstring(
        piece.find("CellData/DataArray").text.replace("\n", " "),
        sep=" ")
    np.testing.assert_allclose(cell, want_z[conn].mean(axis=1),
                               rtol=1e-6)


def test_landscape_cli_trajectory(tmp_path):
    """--trajectory consumes an epoch-tagged checkpoint series, plots
    the PCA-projected path over the surface and stores the projected
    coordinates (reference plot_trajectory.py + projection.py)."""
    import json
    import io
    import os
    from contextlib import redirect_stdout
    from physicsbasedfwi2_tpu.landscape.cli import main
    from physicsbasedfwi2_tpu.engine import get_workload, create_engine

    # build a small checkpoint series by perturbing a fresh engine
    cfg = get_workload("marmousi_acoustic").replace(
        nz=48, nx=64, nt=300, num_shots=4, num_receivers=32,
        filters=(4, 8, 16), chunk=25, water_rows=6,
        save_dir=str(tmp_path), name="traj_run")
    eng = create_engine(cfg)
    import jax
    base = eng.params
    for i, tag in enumerate((10, 20, 30, 40)):
        eng.params = jax.tree_util.tree_map(
            lambda w: w * (1.0 + 0.02 * i) + 0.001 * i, base)
        eng.save_networks(tag)
    ckpt_dir = os.path.join(str(tmp_path), "traj_run")

    buf = io.StringIO()
    with redirect_stdout(buf):
        main(["--workload", "marmousi_acoustic", "--small",
              "--name", "traj", "--out", str(tmp_path),
              "--trajectory", ckpt_dir])
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert np.isfinite(out["min"])
    with np.load(tmp_path / "traj_surface.npz") as z:
        assert z["traj_coords"].shape == (4, 2)
        assert list(z["traj_epochs"]) == [10, 20, 30, 40]
        # final checkpoint is the PCA center
        np.testing.assert_allclose(z["traj_coords"][-1], 0.0,
                                   atol=1e-3)
    assert os.path.exists(tmp_path / "traj_surface.png")
