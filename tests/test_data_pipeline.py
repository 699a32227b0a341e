"""End-to-end data pipeline tests over a synthetic on-disk DAVIS-style set."""

import os

import numpy as np
import pytest

from rmnet_tpu.config import Config
from rmnet_tpu.data import DatasetCollector, DatasetSubset, DataLoader, write_flo, read_flo
from rmnet_tpu.data.transforms import (
    Compose,
    resize_bilinear_np,
    resize_nearest_np,
    affine_warp_numpy,
)


# canonical fixture generator lives in the package (also used by
# tools/bench_loader.py); re-exported here for existing importers
from rmnet_tpu.data.synthetic import make_synthetic_davis  # noqa: E402


@pytest.fixture(scope="module")
def davis_cfg(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("davis"))
    index_path, img_dir, ann_dir, flo_dir = make_synthetic_davis(root)
    cfg = Config()
    cfg.DATASETS.DAVIS.INDEXING_FILE_PATH = index_path
    cfg.DATASETS.DAVIS.IMG_FILE_PATH = img_dir + "/%s/%05d.jpg"
    cfg.DATASETS.DAVIS.ANNOTATION_FILE_PATH = ann_dir + "/%s/%05d.png"
    cfg.DATASETS.DAVIS.OPTICAL_FLOW_FILE_PATH = flo_dir + "/%s/%05d.flo"
    cfg.TRAIN.AUGMENTATION.RESIZE_SIZE = 64
    cfg.TRAIN.AUGMENTATION.CROP_HSIZE = 48
    cfg.TRAIN.AUGMENTATION.CROP_WSIZE = 48
    return cfg


def test_flo_roundtrip(tmp_path):
    flow = np.random.RandomState(0).rand(5, 7, 2).astype(np.float32)
    p = str(tmp_path / "x.flo")
    write_flo(p, flow)
    with open(p, "rb") as f:
        out = read_flo(f.read())
    np.testing.assert_array_equal(out, flow)


def test_val_dataset_shapes(davis_cfg):
    ds = DatasetCollector.get_dataset(davis_cfg, "DAVIS", DatasetSubset.VAL)
    assert len(ds) == 2
    name, n_objects, frames, masks, flows = ds[0]
    assert name == "DAVIS/vid00"
    T = 4
    K = davis_cfg.TEST.N_MAX_OBJECTS + 1
    assert frames.shape == (T, 64, 96, 3) and frames.dtype == np.float32
    assert masks.shape == (T, K, 64, 96) and masks.dtype == np.uint8
    assert flows.shape == (T, 64, 96, 2)
    assert list(n_objects) == [2, 2, 2, 2]
    # one-hot sanity: each pixel in exactly one channel
    np.testing.assert_array_equal(masks.sum(axis=1), np.ones((T, 64, 96)))


def test_train_dataset_shapes_and_curriculum(davis_cfg):
    ds = DatasetCollector.get_dataset(davis_cfg, ["DAVISx2"], DatasetSubset.TRAIN)
    assert len(ds) == 4  # 2 videos x 2 repeat
    ds.set_frame_step(2)
    name, n_objects, frames, masks, flows = ds[1]
    T = davis_cfg.TRAIN.N_MAX_FRAMES
    K = davis_cfg.TRAIN.N_MAX_OBJECTS + 1
    assert frames.shape == (T, 48, 48, 3)
    assert masks.shape == (T, K, 48, 48)
    assert flows.shape == (T, 48, 48, 2)


def test_dataloader_batching(davis_cfg):
    ds = DatasetCollector.get_dataset(davis_cfg, "DAVIS", DatasetSubset.TRAIN)
    dl = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True, seed=0)
    batches = list(dl)
    assert len(batches) == 1
    names, n_objects, frames, masks, flows = batches[0]
    assert len(names) == 2
    assert frames.shape[0] == 2 and frames.shape[1] == 3


def test_dataloader_multiworker_ordered(davis_cfg):
    """N_WORKERS decode threads must emit batches in the same order AND with
    bit-identical data as the synchronous path (reference
    DataLoader(num_workers=N), /root/reference/core/train.py:37-44): every
    augmentation draw goes through a per-batch-seeded thread-local stream
    (data/rng.py), so decoded data depends only on (seed, epoch, batch
    index), never on worker count or thread scheduling."""
    ds = DatasetCollector.get_dataset(davis_cfg, ["DAVISx8"], DatasetSubset.TRAIN)
    ref = DataLoader(ds, batch_size=2, shuffle=True, seed=3, n_workers=0)
    par = DataLoader(ds, batch_size=2, shuffle=True, seed=3, n_workers=4)
    for epoch in range(2):  # epoch streams differ but stay reproducible
        ref_batches = list(ref)
        par_batches = list(par)
        assert len(ref_batches) == len(par_batches) == 8
        for (n1, o1, f1, m1, fl1), (n2, o2, f2, m2, fl2) in zip(
            ref_batches, par_batches
        ):
            assert n1 == n2
            np.testing.assert_array_equal(o1, o2)
            np.testing.assert_array_equal(f1, f2)
            np.testing.assert_array_equal(m1, m2)
            np.testing.assert_array_equal(fl1, fl2)


def test_dataloader_multiworker_decodes_concurrently():
    """Workers must overlap: with 4 workers, 8 slow items finish ~2x+ faster
    than serially, and a mid-stream decode error surfaces at its position."""
    import time

    class SlowDataset:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            time.sleep(0.05)
            return (f"v{i}", np.array([1]), np.full((2, 2, 3), i, np.float32),
                    np.zeros((1, 2, 2, 2), np.uint8), np.zeros((1, 2, 2, 2), np.float32))

    t0 = time.time()
    out = list(DataLoader(SlowDataset(), batch_size=1, n_workers=4))
    elapsed = time.time() - t0
    assert [b[0][0] for b in out] == [f"v{i}" for i in range(8)]
    assert elapsed < 0.05 * 8 * 0.8, f"no decode overlap: {elapsed:.2f}s"

    class BadDataset(SlowDataset):
        def __getitem__(self, i):
            if i == 5:
                raise ValueError("corrupt frame")
            return super().__getitem__(i)

    loader = DataLoader(BadDataset(), batch_size=1, n_workers=4)
    it = iter(loader)
    for _ in range(5):
        next(it)
    with pytest.raises(ValueError, match="corrupt frame"):
        next(it)


def test_resize_np_matches_jax_ops():
    import jax.numpy as jnp
    from rmnet_tpu.ops import resize_bilinear, resize_nearest

    rs = np.random.RandomState(3)
    img = rs.rand(33, 47, 3).astype(np.float32)
    out_np = resize_bilinear_np(img, 21, 30)
    out_j = resize_bilinear(jnp.asarray(img[None]), (21, 30))[0]
    np.testing.assert_allclose(out_np, np.asarray(out_j), rtol=1e-4, atol=1e-5)

    m = rs.randint(0, 5, (33, 47)).astype(np.uint8)
    out_np = resize_nearest_np(m, 21, 30)
    out_j = resize_nearest(jnp.asarray(m[None, ..., None]), (21, 30))[0, ..., 0]
    np.testing.assert_array_equal(out_np, np.asarray(out_j))


def test_affine_warp_identity_and_fill():
    img = np.random.RandomState(1).rand(8, 10, 3).astype(np.float32)
    ident = np.array([[1, 0, 0], [0, 1, 0]], np.float32)
    np.testing.assert_allclose(affine_warp_numpy(img, ident, (0, 0, 0)), img, atol=1e-6)
    # pure translation beyond the border fills
    shift = np.array([[1, 0, 100], [0, 1, 0]], np.float32)
    out = affine_warp_numpy(img, shift, (9, 9, 9))
    np.testing.assert_allclose(out, 9.0)


def test_affine_warp_native_matches_numpy():
    from rmnet_tpu.native import flow_affine_native

    if flow_affine_native is None:
        pytest.skip("native library not built")
    rs = np.random.RandomState(2)
    img = rs.rand(16, 20, 2).astype(np.float32)
    mat = np.array([[0.9, 0.1, 1.5], [-0.1, 1.05, -0.7]], np.float32)
    for nearest in (False, True):
        np.testing.assert_allclose(
            flow_affine_native.affine_warp(img, mat, np.zeros(2, np.float32), nearest),
            affine_warp_numpy(img, mat, (0, 0), nearest),
            atol=1e-4,
        )


def test_random_affine_pipeline_consistency(davis_cfg):
    """RandomAffine keeps flow consistent: warping frame t-1's content by the
    updated flow must roughly align with frame t's content (moving squares)."""
    ds = DatasetCollector.get_dataset(davis_cfg, "DAVIS", DatasetSubset.TRAIN)
    np.random.seed(0)
    import random as _r

    _r.seed(0)
    _, n_objects, frames, masks, flows = ds[0]
    assert frames.shape[1:] == (48, 48, 3)
    assert np.isfinite(flows).all()


def test_dataloader_does_not_leak_seeded_stream(davis_cfg):
    """After iterating (sync path decodes on the consumer thread), the
    thread's RNG stream must revert to the process-global modules."""
    from rmnet_tpu.data.rng import pyrand

    import random as _random

    ds = DatasetCollector.get_dataset(davis_cfg, ["DAVIS"], DatasetSubset.TRAIN)
    list(DataLoader(ds, batch_size=2, shuffle=True, seed=1, n_workers=0))
    assert pyrand() is _random
