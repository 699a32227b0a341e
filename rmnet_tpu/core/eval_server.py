"""Continuous checkpoint-evaluation daemon (TPU twin of utils/eval_server.py).

Watches a checkpoint directory, evaluates each new checkpoint over the full
val set on free devices (DeviceFarm dispatch instead of thread-per-GPU), logs
scalars, and keeps only the best checkpoint on disk
(reference utils/eval_server.py:155-263).
"""

from __future__ import annotations

import logging
import os
import shutil
import time
from typing import Dict, Optional, Set

from rmnet_tpu.core.engine import InferenceEngine, build_models
from rmnet_tpu.core.test import test_net
from rmnet_tpu.data import DataLoader, DatasetCollector, DatasetSubset
from rmnet_tpu.parallel.eval_farm import DeviceFarm
from rmnet_tpu.utils.checkpoint import load_weights_auto
from rmnet_tpu.utils.metrics import Metrics
from rmnet_tpu.utils.summary import SummaryWriter


def get_checkpoints(ckpt_dir: str, evaluated: Set[str]):
    """New checkpoint paths in the directory (orbax dirs or .pth files)."""
    fresh = []
    if not os.path.isdir(ckpt_dir):
        return fresh
    for entry in sorted(os.listdir(ckpt_dir)):
        path = os.path.join(ckpt_dir, entry)
        if entry in evaluated or entry.startswith("."):
            continue
        if entry.startswith("ckpt") and (os.path.isdir(path) or entry.endswith(".pth")):
            fresh.append(path)
    return fresh


def fetch_remote_checkpoints(url: str, local_dir: str, evaluated: Set[str]):
    """Scrape an HTTP directory listing for new .pth checkpoints and download
    them (capability of reference utils/eval_server.py:129-144, which scrapes
    a remote training box's checkpoint dir). Plain stdlib: anchor hrefs ending
    in .pth are fetched into ``local_dir``."""
    import re
    import urllib.request

    os.makedirs(local_dir, exist_ok=True)
    with urllib.request.urlopen(url) as resp:
        html = resp.read().decode("utf-8", "replace")
    names = set(re.findall(r'href="([^"]+\.pth)"', html))
    fetched = []
    for name in sorted(names):
        base = os.path.basename(name)
        if base in evaluated:
            continue
        dest = os.path.join(local_dir, base)
        if not os.path.exists(dest):
            logging.info("Downloading remote checkpoint %s", base)
            urllib.request.urlretrieve(url.rstrip("/") + "/" + name, dest)
        fetched.append(dest)
    return fetched


def eval_server(cfg, ckpt_dir: str, poll_seconds: float = 15.0,
                keep_best_only: bool = True, max_iterations: Optional[int] = None,
                remote_url: Optional[str] = None):
    """Run forever (or max_iterations): evaluate every new checkpoint.

    With ``remote_url``, new .pth checkpoints are scraped+downloaded from an
    HTTP directory listing into ``ckpt_dir`` before each scan (the reference
    eval_server's --remote mode)."""
    log_dir = os.path.join(cfg.DIR.OUTPUT_DIR, "logs", cfg.CONST.EXP_NAME)
    writer = SummaryWriter(log_dir, "eval_server")

    evaluated: Set[str] = set()
    scores: Dict[str, Metrics] = {}
    best_path: Optional[str] = None
    iteration = 0
    while max_iterations is None or iteration < max_iterations:
        iteration += 1
        if remote_url:
            try:
                fetch_remote_checkpoints(remote_url, ckpt_dir, evaluated)
            except Exception as ex:
                logging.warning("remote checkpoint fetch failed: %s", ex)
        fresh = get_checkpoints(ckpt_dir, evaluated)
        evaluated.update(os.path.basename(p) for p in fresh)
        if fresh:
            results = evaluate_checkpoints_farm(cfg, fresh)
            for path, metrics in zip(fresh, results):
                if metrics is None:  # skip bad checkpoints, keep serving
                    continue
                scores[path] = metrics
                jf = metrics.state_dict()[cfg.TEST.MAIN_METRIC_NAME]
                writer.add_scalar("EvalServer/%s" % cfg.TEST.MAIN_METRIC_NAME,
                                  jf, iteration)
                logging.info("Evaluated %s: %s", os.path.basename(path), metrics)
                if best_path is None or metrics.better_than(scores.get(best_path)):
                    best_path = path
            if keep_best_only:
                # keep only the best checkpoint on disk
                # (reference utils/eval_server.py:225-236)
                for p in list(scores):
                    if p != best_path and os.path.exists(p):
                        shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
                        logging.info("Removed non-best checkpoint %s", p)
        if max_iterations is None or iteration < max_iterations:
            time.sleep(poll_seconds)
    writer.close()
    return best_path, scores


def evaluate_checkpoints_farm(cfg, paths):
    """Evaluate checkpoints concurrently, one model replica per device.

    The TPU twin of the reference's thread-per-GPU checkpoint farm
    (utils/eval_server.py:78-87, 249-263): each DeviceFarm worker pins an
    InferenceEngine to its device and scores one checkpoint over the full
    val set; a failed checkpoint yields None (skip-and-continue). Each
    worker builds its own DataLoader, as the reference's per-replica
    loaders do (utils/eval_server.py:84-86).
    """

    # dataset parsed once; each worker gets its own LIGHT loader over it
    # (the reference builds one loader per replica, utils/eval_server.py:84-86)
    dataset = DatasetCollector.get_dataset(cfg, cfg.DATASET.TEST_DATASET,
                                           DatasetSubset.VAL)

    def work(device, _replica, path):
        try:
            loader = DataLoader(dataset, batch_size=1, shuffle=False)
            _, _, rm_vars, tfn_vars = build_models(cfg, cfg.CONST.RNG_SEED)
            rm_vars, tfn_vars, _ = load_weights_auto(path, rm_vars, tfn_vars)
            engine = InferenceEngine(cfg, rm_vars, tfn_vars, device=device)
            return test_net(cfg, -1, loader, None, engine)
        except Exception as ex:  # bad checkpoint: score None, keep serving
            logging.exception(ex)
            return None

    return DeviceFarm(work).map(paths)
