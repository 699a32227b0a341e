"""End-to-end smoke: train 1 epoch on a synthetic DAVIS-style set, validate,
checkpoint, reload the checkpoint standalone, export benchmark PNGs, and run
the eval server for one iteration. Exercises the full runner surface."""

import glob
import os

import numpy as np
import pytest

from rmnet_tpu.config import Config
from tests.test_data_pipeline import make_synthetic_davis


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("davis_e2e"))
    index_path, img_dir, ann_dir, flo_dir = make_synthetic_davis(
        root, n_videos=2, n_frames=4, hw=(48, 64)
    )
    cfg = Config()
    cfg.DATASETS.DAVIS.INDEXING_FILE_PATH = index_path
    cfg.DATASETS.DAVIS.IMG_FILE_PATH = img_dir + "/%s/%05d.jpg"
    cfg.DATASETS.DAVIS.ANNOTATION_FILE_PATH = ann_dir + "/%s/%05d.png"
    cfg.DATASETS.DAVIS.OPTICAL_FLOW_FILE_PATH = flo_dir + "/%s/%05d.flo"
    cfg.DATASET.TRAIN_DATASET = "DAVIS"
    cfg.DATASET.TEST_DATASET = "DAVIS"
    cfg.DIR.OUTPUT_DIR = str(tmp_path_factory.mktemp("out"))
    cfg.CONST.EXP_NAME = "smoke"
    cfg.TRAIN.N_EPOCHS = 1
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.TRAIN.N_MAX_FRAMES = 2
    cfg.TRAIN.N_MAX_OBJECTS = 2
    cfg.TRAIN.AUGMENTATION.RESIZE_SIZE = 48
    cfg.TRAIN.AUGMENTATION.CROP_HSIZE = 48
    cfg.TRAIN.AUGMENTATION.CROP_WSIZE = 48
    cfg.TRAIN.CKPT_SAVE_THRESHOLD = -1.0  # always save in the smoke run
    cfg.TRAIN.KEEP_FRAME_STEPS_THRESHOLD = 2.0
    cfg.TEST.N_MAX_OBJECTS = 2
    cfg.TEST.MEMORIZE_EVERY = 2
    cfg.TEST.MEMORY_CAPACITY = 4
    cfg.TEST.TESTING_VIDEOS_INDEXES = (0,)
    cfg.TEST.VISUALIZE_EVERY = 0
    return cfg


def test_train_eval_ckpt_roundtrip(tiny_cfg):
    from rmnet_tpu.core.train import train_net
    from rmnet_tpu.core.test import test_net
    from rmnet_tpu.core.inference import inference_net
    from rmnet_tpu.core.eval_server import eval_server

    cfg = tiny_cfg
    best = train_net(cfg)
    assert best is not None
    jf = best.state_dict()["JF-Mean"]
    assert 0.0 <= jf <= 1.0

    ckpt_dir = os.path.join(cfg.DIR.OUTPUT_DIR, "checkpoints", cfg.CONST.EXP_NAME)
    best_path = os.path.join(ckpt_dir, "ckpt-best")
    assert os.path.isdir(best_path)

    # standalone test path: reload the checkpoint from disk
    cfg.CONST.WEIGHTS = best_path
    metrics = test_net(cfg, epoch_idx=-1)
    assert 0.0 <= metrics.state_dict()["JF-Mean"] <= 1.0

    # benchmark PNG export on the TEST subset
    inference_net(cfg)
    pngs = glob.glob(
        os.path.join(cfg.DIR.OUTPUT_DIR, "benchmark", cfg.CONST.EXP_NAME, "**", "*.png"),
        recursive=True,
    )
    assert len(pngs) == 8  # 2 videos x 4 frames
    # palette PNGs contain the object labels
    from PIL import Image

    sample = np.array(Image.open(pngs[0]))
    assert sample.dtype == np.uint8

    # eval server: one pass over the ckpt dir must score ckpt-best
    best_found, scores = eval_server(cfg, ckpt_dir, max_iterations=1)
    assert best_found is not None
    assert any("ckpt-best" in p for p in scores)


def test_test_net_n_streams_parity(tiny_cfg):
    """cfg.TEST.N_STREAMS=2 batches the val sweep through run_video_batch
    (VERDICT r4 #2: serve the val set N-way) and must score exactly what
    per-video serving scores."""
    import copy

    from rmnet_tpu.core.engine import InferenceEngine, build_models
    from rmnet_tpu.core.test import test_net

    cfg = copy.deepcopy(tiny_cfg)
    cfg.CONST.WEIGHTS = ""  # deterministic fresh weights
    _, _, rm_vars, tfn_vars = build_models(cfg, 0)

    m1 = test_net(cfg, epoch_idx=-1,
                  engine=InferenceEngine(cfg, rm_vars, tfn_vars))
    cfg2 = copy.deepcopy(cfg)
    cfg2.TEST.N_STREAMS = 2
    m2 = test_net(cfg2, epoch_idx=-1,
                  engine=InferenceEngine(cfg2, rm_vars, tfn_vars))

    s1, s2 = m1.state_dict(), m2.state_dict()
    assert s1.keys() == s2.keys()
    for k in s1:
        np.testing.assert_allclose(s2[k], s1[k], rtol=1e-6, atol=1e-6,
                                   err_msg=k)


def test_runner_cli_overrides(tiny_cfg, tmp_path):
    """--set overrides + config file loading through the CLI arg path."""
    from rmnet_tpu.runner import get_args
    from rmnet_tpu.config import Config

    cfg_file = tmp_path / "user_cfg.py"
    cfg_file.write_text(
        "def configure(cfg):\n    cfg.TRAIN.BATCH_SIZE = 7\n    cfg.CONST.EXP_NAME = 'fromfile'\n"
    )
    args = get_args(["--cfg", str(cfg_file), "--set", "TEST.MEMORIZE_EVERY=3",
                     "--set", "TRAIN.NETWORK=TinyFlowNet"])
    cfg = Config.from_file(args.cfg_file).apply_overrides(args.overrides)
    assert cfg.TRAIN.BATCH_SIZE == 7
    assert cfg.CONST.EXP_NAME == "fromfile"
    assert cfg.TEST.MEMORIZE_EVERY == 3
    assert cfg.TRAIN.NETWORK == "TinyFlowNet"
    with pytest.raises(AttributeError):
        cfg.apply_overrides(["TRAIN.NO_SUCH=1"])
