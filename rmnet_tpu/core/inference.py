"""Benchmark-submission inference: palette PNG export per video.

Capability of reference core/inference.py:21-71 — runs the TEST subset with
multi-scale inference and writes per-frame palettized segmentations under
output/benchmark/<exp>/<video>/%05d.png.
"""

from __future__ import annotations

import logging
import os

import numpy as np

from rmnet_tpu.core.engine import InferenceEngine, build_models
from rmnet_tpu.data import DataLoader, DatasetCollector, DatasetSubset
from rmnet_tpu.utils.checkpoint import load_weights_auto
from rmnet_tpu.utils.seg_viz import get_segmentation


def inference_net(cfg, save_overlays: bool = False):
    test_loader = DataLoader(
        DatasetCollector.get_dataset(cfg, cfg.DATASET.TEST_DATASET, DatasetSubset.TEST),
        batch_size=1,
        shuffle=False,
        n_workers=cfg.CONST.N_WORKERS,
    )

    _, _, rm_vars, tfn_vars = build_models(cfg, cfg.CONST.RNG_SEED)
    logging.info("Recovering from %s ...", cfg.CONST.WEIGHTS)
    rm_vars, tfn_vars, _ = load_weights_auto(cfg.CONST.WEIGHTS, rm_vars, tfn_vars)
    engine = InferenceEngine(cfg, rm_vars, tfn_vars)

    norm = {"mean": cfg.CONST.DATASET_MEAN, "std": cfg.CONST.DATASET_STD}
    for idx, (names, n_objects, frames, masks, flows) in enumerate(test_loader):
        video_name = names[0]
        _, est_probs = engine.multi_scale_inference(frames[0], masks[0], n_objects[0])
        est_labels = est_probs.argmax(axis=1)  # (T, H, W)

        out_dir = os.path.join(
            cfg.DIR.OUTPUT_DIR, "benchmark", cfg.CONST.EXP_NAME, video_name
        )
        os.makedirs(out_dir, exist_ok=True)
        for i in range(est_labels.shape[0]):
            if save_overlays:
                img = get_segmentation(frames[0][i], est_labels[i], norm)
            else:
                img = get_segmentation(None, est_labels[i])
            img.save(os.path.join(out_dir, "%05d.png" % i))
        logging.info("Inference[%d/%d] VideoName = %s", idx + 1, len(test_loader), video_name)
