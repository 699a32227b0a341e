"""Continuous checkpoint-evaluation daemon (TPU twin of utils/eval_server.py).

Watches a checkpoint directory, evaluates each new checkpoint over the full
val set on free devices (DeviceFarm dispatch instead of thread-per-GPU), logs
scalars, and keeps only the best checkpoint on disk
(reference utils/eval_server.py:155-263).
"""

from __future__ import annotations

import logging
import os
import re
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
                remote_url: Optional[str] = None, stop_event=None):
    """Run forever (or max_iterations): evaluate every new checkpoint.

    Dispatch is ASYNCHRONOUS: new checkpoints are submitted to a persistent
    per-device farm and the poll loop keeps running — completed evaluations
    are harvested every tick, so a slow checkpoint on one device never
    delays scoring/pruning of a fast one on another (the reference harvests
    worker threads while polling every 15 s, utils/eval_server.py:216-263).

    With ``remote_url``, new .pth checkpoints are scraped+downloaded from an
    HTTP directory listing into ``ckpt_dir`` before each scan (the reference
    eval_server's --remote mode). ``stop_event`` (a ``threading.Event``)
    requests a graceful exit: the loop stops scanning, drains in-flight
    evaluations, and returns."""
    log_dir = os.path.join(cfg.DIR.OUTPUT_DIR, "logs", cfg.CONST.EXP_NAME)
    writer = SummaryWriter(log_dir, "eval_server")

    evaluated: Set[str] = set()
    scores: Dict[str, Metrics] = {}
    pending: Dict[str, Any] = {}  # path -> Future
    submit_idx: Dict[str, int] = {}  # path -> submission order (stable)
    best_path: Optional[str] = None
    farm = None
    iteration = 0

    def _ckpt_step(path):
        # TB step = the checkpoint's own number (ckpt-epoch-NNN), not the
        # harvest tick: async completion order must not scramble the curve
        # digit-free names fall back to the submission index recorded at
        # submit time (scan order) — NOT len(scores), which depends on
        # async harvest order and would scramble the curve
        m = re.search(r"(\d+)(?!.*\d)", os.path.basename(path))
        return int(m.group(1)) if m else submit_idx.get(path, 0)

    def record(path, metrics):
        nonlocal best_path
        if metrics is None:  # skip bad checkpoints, keep serving
            return
        scores[path] = metrics
        jf = metrics.state_dict()[cfg.TEST.MAIN_METRIC_NAME]
        writer.add_scalar(
            "EvalServer/%s" % cfg.TEST.MAIN_METRIC_NAME, jf, _ckpt_step(path)
        )
        logging.info("Evaluated %s: %s", os.path.basename(path), metrics)
        # deterministic best: strictly-greater wins; an exact tie goes to
        # the lexicographically-earlier path, so async completion order
        # cannot change which file keep_best_only leaves on disk
        cur = scores.get(best_path) if best_path is not None else None
        if cur is None:
            best_path = path
        else:
            cur_jf = cur.state_dict()[cfg.TEST.MAIN_METRIC_NAME]
            if jf > cur_jf or (jf == cur_jf and path < best_path):
                best_path = path

    def harvest(tick):
        del tick
        for path in [p for p, f in pending.items() if f.done()]:
            record(path, pending.pop(path).result())

    def prune():
        # keep only the best checkpoint on disk
        # (reference utils/eval_server.py:225-236)
        if not keep_best_only:
            return
        for p in list(scores):
            if p != best_path and os.path.exists(p):
                shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
                logging.info("Removed non-best checkpoint %s", p)

    stopped = (lambda: stop_event.is_set()) if stop_event is not None else (lambda: False)
    while (max_iterations is None or iteration < max_iterations) and not stopped():
        iteration += 1
        if remote_url:
            try:
                fetch_remote_checkpoints(remote_url, ckpt_dir, evaluated)
            except Exception as ex:
                logging.warning("remote checkpoint fetch failed: %s", ex)
        fresh = get_checkpoints(ckpt_dir, evaluated)
        evaluated.update(os.path.basename(p) for p in fresh)
        if fresh and farm is None:
            farm = _make_farm(cfg)
        for path in fresh:
            submit_idx[path] = len(submit_idx)
            pending[path] = farm.submit(path)
        harvest(iteration)
        prune()
        if (max_iterations is None or iteration < max_iterations) and not stopped():
            if stop_event is not None:
                stop_event.wait(poll_seconds)
            else:
                time.sleep(poll_seconds)
    # drain in-flight evaluations before returning; on a stop request,
    # queued-but-unstarted ones are all cancelled FIRST (stopping must not
    # run the whole backlog of full val-set evaluations, and cancelling
    # before blocking on any result keeps workers from starting more)
    cancelled = (
        {p for p, f in pending.items() if f.cancel()} if stopped() else set()
    )
    for path, future in pending.items():
        if path not in cancelled:
            record(path, future.result())
    prune()
    if farm is not None:
        farm.shutdown()
    writer.close()
    return best_path, scores


def _make_eval_worker(cfg, dataset):
    """DeviceFarm work fn: score one checkpoint on one pinned device.

    Each worker builds its own LIGHT loader over the shared parsed dataset,
    as the reference's per-replica loaders do (utils/eval_server.py:84-86);
    a failed checkpoint yields None (skip-and-continue,
    utils/eval_server.py:111-114).

    The freshly-initialized model template is built ONCE (it only provides
    the pytree structure for the checkpoint import), and each device keeps
    its pinned engine across checkpoints via ``update_weights`` — weights
    are jit arguments, so a long-running scorer compiles once per geometry
    instead of once per checkpoint."""
    _, _, rm_tmpl, tfn_tmpl = build_models(cfg, cfg.CONST.RNG_SEED)
    engines = {}  # device -> InferenceEngine; one farm thread per device
    # the block-sparse flash read beats dense XLA at every bank size but its
    # ~25-50 s Mosaic compile only amortizes in a long-running process —
    # which an eval server scoring many checkpoints at one geometry is, now
    # that engines persist across checkpoints. Default it ON here (an
    # explicit RMNET_FLASH env still wins; single-sweep test_net stays dense)
    flash_default = True if os.environ.get("RMNET_FLASH") is None else None

    def work(device, _replica, path):
        for attempt in (0, 1):
            in_engine = False
            try:
                loader = DataLoader(dataset, batch_size=1, shuffle=False)
                rm_vars, tfn_vars, _ = load_weights_auto(path, rm_tmpl, tfn_tmpl)
                engine = engines.get(device)
                if engine is None:
                    engines[device] = engine = InferenceEngine(
                        cfg, rm_vars, tfn_vars, device=device,
                        use_flash_attention=(flash_default if attempt == 0
                                             else False),
                    )
                else:
                    engine.update_weights(rm_vars, tfn_vars)
                in_engine = True
                result = test_net(cfg, -1, loader, None, engine)
                if attempt == 1:
                    logging.warning(
                        "%s scored on the dense read after a flash-engine "
                        "failure; device %s stays dense for this server",
                        path, device,
                    )
                return result
            except Exception as ex:  # bad checkpoint: score None, keep serving
                logging.exception(ex)
                engine = engines.get(device)
                if (attempt == 0 and in_engine and engine is not None
                        and engine._flash_enabled() and flash_default):
                    # a Mosaic/flash failure during the run would poison the
                    # persistent engine for every later checkpoint — drop it
                    # and retry this checkpoint once on the dense XLA read.
                    # Only when flash was on BY DEFAULT: an explicit
                    # RMNET_FLASH=1 is never silently overridden. (A
                    # checkpoint-load failure raises BEFORE in_engine and
                    # keeps the compiled engine.)
                    logging.warning(
                        "retrying %s with the dense memory read", path
                    )
                    engines.pop(device, None)
                    continue
                if attempt == 1:
                    # the dense retry ALSO failed: the checkpoint (not the
                    # flash kernel) was at fault — drop the dense engine so
                    # the next checkpoint gets the flash default back
                    engines.pop(device, None)
                return None

    return work


def _make_farm(cfg):
    from rmnet_tpu.parallel.eval_farm import AsyncDeviceFarm

    dataset = DatasetCollector.get_dataset(cfg, cfg.DATASET.TEST_DATASET,
                                           DatasetSubset.VAL)
    return AsyncDeviceFarm(_make_eval_worker(cfg, dataset))


def evaluate_checkpoints_farm(cfg, paths):
    """Evaluate checkpoints concurrently, one model replica per device.

    Synchronous convenience over the same per-device worker the async
    eval_server loop uses: each DeviceFarm worker pins an InferenceEngine
    to its device and scores one checkpoint over the full val set
    (reference utils/eval_server.py:78-87, 249-263)."""
    dataset = DatasetCollector.get_dataset(cfg, cfg.DATASET.TEST_DATASET,
                                           DatasetSubset.VAL)
    return DeviceFarm(_make_eval_worker(cfg, dataset)).map(paths)
