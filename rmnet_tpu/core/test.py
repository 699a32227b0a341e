"""Evaluation loop: per-video streaming inference + DAVIS J&F metrics.

Capability of reference core/test.py:24-141 — dual mode:
  * standalone (epoch_idx == -1): full val set, multi-scale inference;
  * in-training validation: only cfg.TEST.TESTING_VIDEOS_INDEXES videos,
    TinyFlowNet flows, single scale.
Per-video metrics are weighted by the object count (core/test.py:104-105).
"""

from __future__ import annotations

import logging
import time
from typing import Optional

import numpy as np

from rmnet_tpu.core.engine import InferenceEngine
from rmnet_tpu.data import DataLoader, DatasetCollector, DatasetSubset
from rmnet_tpu.utils.average_meter import AverageMeter
from rmnet_tpu.utils.metrics import Metrics
from rmnet_tpu.utils.profiling import trace_if
from rmnet_tpu.utils.seg_viz import get_segmentation


def test_net(
    cfg,
    epoch_idx: int = -1,
    test_data_loader: Optional[DataLoader] = None,
    test_writer=None,
    engine: Optional[InferenceEngine] = None,
    raise_on_total_failure: bool = True,
) -> Metrics:
    if test_data_loader is None:
        test_data_loader = DataLoader(
            DatasetCollector.get_dataset(cfg, cfg.DATASET.TEST_DATASET, DatasetSubset.VAL),
            batch_size=1,
            shuffle=False,
            n_workers=cfg.CONST.N_WORKERS,
        )

    if engine is None:
        from rmnet_tpu.core.engine import build_models
        from rmnet_tpu.utils.checkpoint import load_weights_auto

        _, _, rm_vars, tfn_vars = build_models(cfg, cfg.CONST.RNG_SEED)
        if cfg.CONST.WEIGHTS:
            logging.info("Recovering from %s ...", cfg.CONST.WEIGHTS)
            rm_vars, tfn_vars, _ = load_weights_auto(cfg.CONST.WEIGHTS, rm_vars, tfn_vars)
        engine = InferenceEngine(cfg, rm_vars, tfn_vars)

    n_videos = len(test_data_loader)
    test_metrics = AverageMeter(Metrics.names())
    fps_meter = AverageMeter()

    # RMNET_TRACE_DIR=<dir> wraps the eval loop in a jax.profiler trace
    # (no-op otherwise) — the reference has no tracing at all (SURVEY §5)
    with trace_if():
        return _test_videos(cfg, epoch_idx, test_data_loader, test_writer,
                            engine, n_videos, test_metrics, fps_meter,
                            raise_on_total_failure)


def _test_videos(cfg, epoch_idx, test_data_loader, test_writer, engine,
                 n_videos, test_metrics, fps_meter,
                 raise_on_total_failure=True) -> Metrics:
    n_attempted = n_scored = 0
    n_streams = max(1, int(getattr(cfg.TEST, "N_STREAMS", 1) or 1))

    def score_one(idx, video_name, frames0, masks0, n_objects0, est_labels, fps):
        nonlocal n_scored
        n_scored += 1
        gt_labels = masks0.argmax(axis=1)
        metrics = Metrics.get(est_labels, gt_labels,
                              n_workers=cfg.CONST.N_WORKERS)
        weight = int(np.max(n_objects0))
        test_metrics.update(metrics, weight)
        fps_meter.update(fps)

        if test_writer is not None and idx < 3 and cfg.TEST.VISUALIZE_EVERY > 0:
            norm = {"mean": cfg.CONST.DATASET_MEAN, "std": cfg.CONST.DATASET_STD}
            for i in range(0, est_labels.shape[0], cfg.TEST.VISUALIZE_EVERY):
                est_img = get_segmentation(frames0[i], est_labels[i], norm,
                                           cfg.CONST.IGNORE_IDX)
                gt_img = get_segmentation(frames0[i], gt_labels[i], norm,
                                          cfg.CONST.IGNORE_IDX)
                test_writer.add_image(
                    "%s/Frame%03d" % (video_name, i),
                    np.concatenate((np.array(est_img), np.array(gt_img)), axis=0),
                    epoch_idx,
                )

        logging.info(
            "Test[%d/%d] VideoName = %s FPS = %.2f Metrics = %s",
            idx + 1, n_videos, video_name, fps, ["%.4f" % m for m in metrics],
        )

    # N-way serving buffer (cfg.TEST.N_STREAMS > 1): videos batch through
    # ONE chunk program via the per-stream ring cursor — ragged lengths and
    # mixed schedules are fine; only the frame size must match, so the
    # buffer flushes on resolution change (YouTube-VOS mixes sizes).
    pending = []

    def flush_pending():
        if not pending:
            return
        group, del_n = list(pending), len(pending)
        del pending[:del_n]
        try:
            tic = time.time()
            outs = engine.run_video_batch(
                [(f, m, n) for _, _, f, m, n in group]
            )
            dt = max(time.time() - tic, 1e-9)
            agg_fps = sum(o.shape[0] for o in outs) / dt
            for (idx, name, f, m, n), est_labels in zip(group, outs):
                # per-video FPS is the group aggregate (streams finish
                # together; per-stream latency is T_i/agg * N)
                score_one(idx, name, f, m, n, est_labels, agg_fps)
        except Exception as ex:
            logging.exception(ex)
            # fall back to serving the group's videos alone so one bad
            # video doesn't void its whole batch (skip-video robustness,
            # reference core/test.py:99-101)
            for idx, name, f, m, n in group:
                try:
                    tic = time.time()
                    est_labels = engine.run_video_labels(f, m, n)
                    fps = est_labels.shape[0] / max(time.time() - tic, 1e-9)
                    score_one(idx, name, f, m, n, est_labels, fps)
                except Exception as ex2:
                    logging.exception(ex2)

    for idx, (names, n_objects, frames, masks, flows) in enumerate(test_data_loader):
        # in-training validation only visits the selected subset
        # (reference core/test.py:71-72)
        if epoch_idx != -1 and idx not in cfg.TEST.TESTING_VIDEOS_INDEXES:
            continue
        video_name = names[0]
        single_scale = tuple(cfg.TEST.FRAME_SCALES) == (1.0,) and not cfg.TEST.FLIP_LR
        n_attempted += 1

        if single_scale and n_streams > 1:
            if pending and pending[-1][2].shape[1:3] != frames[0].shape[1:3]:
                flush_pending()  # resolution change: close the open batch
            pending.append((idx, video_name, frames[0], masks[0], n_objects[0]))
            if len(pending) >= n_streams:
                flush_pending()
            continue

        try:
            tic = time.time()
            if epoch_idx == -1 and not single_scale:
                _, est_probs = engine.multi_scale_inference(
                    frames[0], masks[0], n_objects[0]
                )
                est_labels = est_probs.argmax(axis=1)  # (T, H, W)
            else:
                # single-scale: stream argmax labels directly (4-bit packed
                # downloads, no probability tensors leave the device)
                est_labels = engine.run_video_labels(frames[0], masks[0], n_objects[0])
            toc = time.time()
        except Exception as ex:  # skip-video robustness (core/test.py:99-101)
            logging.exception(ex)
            continue

        fps = est_labels.shape[0] / max(toc - tic, 1e-9)
        score_one(idx, video_name, frames[0], masks[0], n_objects[0],
                  est_labels, fps)

    flush_pending()

    if n_attempted > 0 and n_scored == 0 and raise_on_total_failure:
        # every single video failed: the ENGINE is broken (e.g. a Mosaic
        # kernel failure), not one flaky video — raise instead of quietly
        # returning 0.0 scores, so callers (the eval farm's dense-read
        # fallback) can react. In-training validation passes
        # raise_on_total_failure=False so a transient val failure logs
        # and continues instead of aborting a long training run.
        raise RuntimeError(
            f"all {n_attempted} videos failed to evaluate — engine broken?"
        )
    logging.info(
        "[Test Summary] FPS = %.2f Metrics = %s",
        fps_meter.avg(), ["%.4f" % m for m in test_metrics.avg()],
    )
    if test_writer is not None:
        for i, name in enumerate(Metrics.names()):
            test_writer.add_scalar("Metric/%s" % name, test_metrics.avg(i), epoch_idx)

    return Metrics(cfg.TEST.MAIN_METRIC_NAME, test_metrics.avg())
