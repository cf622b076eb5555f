"""Data layer: npy contracts, synthetic tree round-trip, native
prefetch loader."""

import os

import numpy as np
import pytest

from physicsbasedfwi2_tpu.data import create_dataset
from physicsbasedfwi2_tpu.data.native_loader import (
    PrefetchNpyLoader, native_available,
)


@pytest.fixture(scope="module")
def npy_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data"))
    rng = np.random.default_rng(0)
    for letter, shape in (("A", (4, 100, 20)), ("B", (30, 40)),
                          ("C", (30, 40)), ("D", (4, 100, 20))):
        d = os.path.join(root, "train" + letter)
        os.makedirs(d)
        for i in range(3):
            np.save(os.path.join(d, f"{i}.npy"),
                    rng.random(shape).astype(np.float32))
    return root


def test_npy_dataset_contract(npy_tree):
    ds = create_dataset(npy_tree, "unalignedVelABCD2")
    assert len(ds) == 3
    item = ds[0]
    assert item["A"].shape == (4, 100, 20)
    assert item["B"].shape == (30, 40)
    assert "A_paths" in item
    batches = list(ds.batches(2, shuffle=True, seed=0))
    assert batches[0]["A"].shape == (2, 4, 100, 20)


def test_elastic_mode_scaling(npy_tree):
    ds = create_dataset(npy_tree, "unalignedVelABCDEl")
    raw = np.load(os.path.join(npy_tree, "trainB", "0.npy"))
    item = ds[0]
    np.testing.assert_allclose(item["B"], raw * 100.0, rtol=1e-5)


def test_write_npy_tree_roundtrip(tmp_path):
    from physicsbasedfwi2_tpu.data import SyntheticAcousticWorkload
    from physicsbasedfwi2_tpu.data.synthetic import write_npy_tree
    wl = SyntheticAcousticWorkload.build(
        nz=32, nx=40, nt=120, dt=0.001, num_shots=2, num_receivers=10,
        water_rows=4, chunk=25, pml_width=10)
    write_npy_tree(str(tmp_path), wl)
    ds = create_dataset(str(tmp_path), "unalignedVelABCD2")
    item = ds[0]
    np.testing.assert_allclose(item["A"], np.asarray(wl.obs), rtol=1e-6)
    np.testing.assert_allclose(item["B"], np.asarray(wl.vp_true))


def test_native_loader(npy_tree):
    paths = [os.path.join(npy_tree, "trainA", f"{i}.npy")
             for i in range(3)]
    loader = PrefetchNpyLoader(paths, n_threads=2, capacity=2)
    arrays = list(loader)
    assert len(arrays) == 3
    for i, a in enumerate(arrays):
        ref = np.load(paths[i]).astype(np.float32)
        assert a.shape == ref.shape
        np.testing.assert_allclose(a, ref, rtol=1e-6)
    # whether native or fallback was used, report it in the test id
    assert arrays[0].dtype == np.float32


def test_native_lib_builds():
    # the environment has g++, so the native path must actually build
    assert native_available()


def test_flip_augmentation(npy_tree):
    ds = create_dataset(npy_tree, "unalignedVelABCD2")
    b_plain = next(ds.batches(3, shuffle=False))
    flipped_any = False
    for seed in range(5):
        b_f = next(ds.batches(3, shuffle=False, flip=True, seed=seed))
        if not np.allclose(b_f["B"], b_plain["B"]):
            flipped_any = True
            # flipped entries mirror the lateral axis
            for i in range(3):
                ok = (np.allclose(b_f["B"][i], b_plain["B"][i]) or
                      np.allclose(b_f["B"][i], b_plain["B"][i][..., ::-1]))
                assert ok
    assert flipped_any
