"""Coverage for less-traveled paths: TTA (multi-scale + LR flip), YouTube-VOS
and static-image datasets, TinyFlowNet training step."""

import json
import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from rmnet_tpu.config import Config
from rmnet_tpu.data import DatasetCollector, DatasetSubset


# ---------------------------------------------------------------- TTA paths
def test_multi_scale_flip_tta():
    from rmnet_tpu.core.engine import InferenceEngine, build_models

    cfg = Config()
    cfg.TEST.FRAME_SCALES = (1.0, 0.5)
    cfg.TEST.FLIP_LR = True
    cfg.TEST.MEMORY_CAPACITY = 4
    cfg.TEST.MEMORIZE_EVERY = 2
    _, _, rm_vars, tfn_vars = build_models(cfg, 0)
    engine = InferenceEngine(cfg, rm_vars, tfn_vars, chunk=4)

    T, K, H, W = 3, 3, 48, 64
    rs = np.random.RandomState(0)
    frames = rs.rand(T, H, W, 3).astype(np.float32)
    labels = np.zeros((T, H, W), np.uint8)
    labels[:, 10:30, 8:28] = 1
    labels[:, 20:40, 40:60] = 2
    masks = np.stack([(labels == k) for k in range(K)], 1).astype(np.uint8)
    n_objects = np.full((T,), 2, np.int32)

    flows, probs = engine.multi_scale_inference(frames, masks, n_objects)
    assert probs.shape == (T, K, H, W)
    assert np.isfinite(probs).all()
    assert flows.shape == (T, H, W, 2)
    # averaged probabilities still sum to ~1 over K
    np.testing.assert_allclose(probs[1:].sum(axis=1), 1.0, atol=1e-3)


# ------------------------------------------------------------- YouTube-VOS
@pytest.fixture()
def ytvos_cfg(tmp_path):
    root = tmp_path / "ytvos"
    subset = "valid"
    meta = {"videos": {}}
    rs = np.random.RandomState(0)
    for vid in ("abc123", "def456"):
        frame_ids = ["00000", "00005", "00010"]
        meta["videos"][vid] = {
            "objects": {"1": {"frames": frame_ids}, "2": {"frames": frame_ids[1:]}}
        }
        img_dir = root / subset / "JPEGImages" / vid
        ann_dir = root / subset / "Annotations" / vid
        img_dir.mkdir(parents=True)
        ann_dir.mkdir(parents=True)
        for i, fid in enumerate(frame_ids):
            Image.fromarray(rs.randint(0, 255, (40, 56, 3), np.uint8)).save(
                img_dir / f"{fid}.jpg"
            )
            m = np.zeros((40, 56), np.uint8)
            m[8:20, 8:20] = 1
            if i >= 1:
                m[22:34, 30:44] = 2
            pm = Image.fromarray(m, mode="P")
            pm.putpalette([0, 0, 0, 128, 0, 0, 0, 128, 0] + [0] * 759)
            pm.save(ann_dir / f"{fid}.png")
    (root / subset).mkdir(exist_ok=True)
    with open(root / subset / "meta.json", "w") as f:
        json.dump(meta, f)

    cfg = Config()
    cfg.DATASETS.YOUTUBE_VOS.INDEXING_FILE_PATH = str(root / "%s" / "meta.json")
    cfg.DATASETS.YOUTUBE_VOS.IMG_FILE_PATH = str(root / "%s/JPEGImages/%s/%s.jpg")
    cfg.DATASETS.YOUTUBE_VOS.ANNOTATION_FILE_PATH = str(root / "%s/Annotations/%s/%s.png")
    cfg.DATASETS.YOUTUBE_VOS.OPTICAL_FLOW_FILE_PATH = str(root / "%s/OpticalFlows/%s/%s.flo")
    cfg.TEST.N_MAX_OBJECTS = 3
    return cfg


def test_youtube_vos_val(ytvos_cfg):
    ds = DatasetCollector.get_dataset(ytvos_cfg, "YOUTUBE_VOS", DatasetSubset.VAL)
    assert len(ds) == 2
    name, n_objects, frames, masks, flows = ds[0]
    assert name.startswith("YouTubeVOS/")
    assert frames.shape == (3, 40, 56, 3)
    assert masks.shape == (3, 4, 40, 56)
    # second object appears at frame 1: cumulative counts [1, 2, 2]
    assert list(n_objects) == [1, 2, 2]
    # missing .flo files -> zero flows
    np.testing.assert_array_equal(flows, 0.0)


# ------------------------------------------------------------ image pretrain
def test_ecssd_image_dataset(tmp_path):
    cfg = Config()
    img_dir = tmp_path / "images"
    msk_dir = tmp_path / "masks"
    img_dir.mkdir()
    msk_dir.mkdir()
    rs = np.random.RandomState(1)
    for i in range(1, 4):
        Image.fromarray(rs.randint(0, 255, (52, 60, 3), np.uint8)).save(
            img_dir / f"{i:04d}.jpg"
        )
        m = np.zeros((52, 60), np.uint8)
        m[10:40, 10:50] = 255  # saliency masks are binary 0/255
        Image.fromarray(m).save(msk_dir / f"{i:04d}.png")
    cfg.DATASETS.ECSSD.N_IMAGES = 3
    cfg.DATASETS.ECSSD.IMG_FILE_PATH = str(img_dir / "%s.jpg")
    cfg.DATASETS.ECSSD.ANNOTATION_FILE_PATH = str(msk_dir / "%s.png")
    cfg.TRAIN.N_MAX_FRAMES = 3
    cfg.TRAIN.N_MAX_OBJECTS = 2
    cfg.TRAIN.AUGMENTATION.RESIZE_SIZE = 48
    cfg.TRAIN.AUGMENTATION.CROP_HSIZE = 40
    cfg.TRAIN.AUGMENTATION.CROP_WSIZE = 40

    ds = DatasetCollector.get_dataset(cfg, "ECSSD", DatasetSubset.TRAIN)
    assert len(ds) == 3
    name, n_objects, frames, masks, flows = ds[0]
    # one image becomes a synthetic 3-frame clip via per-frame RandomAffine
    assert frames.shape == (3, 40, 40, 3)
    assert masks.shape == (3, 3, 40, 40)
    # TEST subset must be rejected for image datasets
    with pytest.raises(ValueError):
        DatasetCollector.get_dataset(cfg, "ECSSD", DatasetSubset.TEST)


# --------------------------------------------------------- tinyflownet train
def test_tinyflownet_train_step():
    from rmnet_tpu.core.engine import build_models
    from rmnet_tpu.core.train import make_optimizer, make_train_step
    from rmnet_tpu.models.rmnet import RMNetApply

    cfg = Config()
    cfg.TRAIN.NETWORK = "TinyFlowNet"
    rmnet, tfn, rm_vars, tfn_vars = build_models(cfg, 0)
    apply = RMNetApply(rmnet, memorize_every=1)
    optimizer = make_optimizer(cfg)
    step = make_train_step(cfg, apply, tfn, optimizer, remat=False)

    B, T, H, W = 2, 2, 64, 64
    rs = np.random.RandomState(0)
    batch = {
        "frames": jnp.asarray(rs.rand(B, T, H, W, 3).astype(np.float32)),
        "masks": jnp.zeros((B, T, 3, H, W), jnp.float32),
        "flows": jnp.asarray(rs.rand(B, T, H, W, 2).astype(np.float32)),
        "n_objects": jnp.ones((B, T), jnp.int32),
    }
    params = tfn_vars["params"]
    opt_state = optimizer.init(params)
    p1 = jax.tree_util.tree_leaves(params)[0].copy()
    params, opt_state, _, loss = step(params, opt_state, {}, batch, jnp.asarray(1e-4))
    assert np.isfinite(float(loss))
    p2 = jax.tree_util.tree_leaves(params)[0]
    assert not np.allclose(np.asarray(p1), np.asarray(p2))  # params moved


def test_test_net_raises_when_every_video_fails():
    """Wholesale engine breakage must raise, not return silent 0.0 scores
    (feeds the eval farm's dense-read fallback)."""
    import pytest as _pytest

    from rmnet_tpu.core.test import _test_videos
    from rmnet_tpu.utils.average_meter import AverageMeter
    from rmnet_tpu.utils.metrics import Metrics

    cfg = Config()

    class BrokenEngine:
        def run_video_labels(self, *a, **k):
            raise RuntimeError("mosaic boom")

    loader = [(
        ["v0"], np.array([[1, 1]]),
        np.zeros((1, 2, 16, 16, 3), np.float32),
        np.zeros((1, 2, 3, 16, 16), np.uint8),
        np.zeros((1, 2, 16, 16, 2), np.float32),
    )]
    with _pytest.raises(RuntimeError, match="engine broken"):
        _test_videos(cfg, -1, loader, None, BrokenEngine(), 1,
                     AverageMeter(Metrics.names()), AverageMeter(["fps"]))
