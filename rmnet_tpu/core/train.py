"""Training loop: jitted data-parallel step, curriculum, gated checkpoints.

Capability of reference core/train.py:29-234, TPU-native:
  * one jitted+donated train step (forward scan + BPTT + Adam update)
    compiled once, batch sharded over the device mesh (XLA all-reduces
    gradients over ICI) instead of DataParallel replication;
  * reference loss recipe: Lovász + NLL on frames 1..T-1 for RMNet, L1
    against precomputed flows for TinyFlowNet (core/train.py:177-180);
    the reference computes TinyFlowNet flows every batch even when training
    RMNet and discards them (core/train.py:170-173) — skipped here;
  * only the selected network's parameters are optimized, matching the
    reference's single optimizer over `network.parameters()`
    (core/train.py:72-76);
  * frame-step curriculum (core/train.py:146-157), JF-gated checkpoint save
    (core/train.py:206-231), per-experiment code snapshot zip
    (core/train.py:112-126);
  * improvement over the reference: full train state (epoch, opt state, rng)
    is checkpointed and restored (the reference restarts its schedule,
    core/train.py:85-98).
"""

from __future__ import annotations

import functools
import logging
import os
import random
import signal
import time
import zipfile
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rmnet_tpu.core.engine import InferenceEngine, build_models
from rmnet_tpu.core.test import test_net
from rmnet_tpu.data import DataLoader, DatasetCollector, DatasetSubset
from rmnet_tpu.models.rmnet import RMNetApply
from rmnet_tpu.ops import l1_loss, lovasz_loss, nll_loss
from rmnet_tpu.parallel import make_mesh, shard_batch
from rmnet_tpu.utils.average_meter import AverageMeter
from rmnet_tpu.utils.checkpoint import (
    load_backbone_weights,
    load_weights_auto,
    save_checkpoint,
)
from rmnet_tpu.utils.metrics import Metrics
from rmnet_tpu.utils.summary import SummaryWriter


def make_optimizer(cfg):
    """torch-Adam parity: L2 weight decay folds into the gradient BEFORE the
    moment updates (unlike AdamW); the learning rate is applied explicitly in
    the train step so the epoch-wise cosine schedule (core/train.py:77) can
    vary without re-jitting."""
    transforms = []
    if cfg.TRAIN.WEIGHT_DECAY:
        transforms.append(optax.add_decayed_weights(cfg.TRAIN.WEIGHT_DECAY))
    transforms.append(optax.scale_by_adam(b1=cfg.TRAIN.BETAS[0], b2=cfg.TRAIN.BETAS[1]))
    return optax.chain(*transforms)


def cosine_lr(base_lr: float, epoch: int, n_epochs: int) -> float:
    """torch CosineAnnealingLR(T_max=n_epochs) value at a given epoch."""
    return base_lr * 0.5 * (1.0 + np.cos(np.pi * epoch / n_epochs))


def make_loss_fn(cfg, apply: RMNetApply, tflownet,
                 remat: Optional[str] = None):
    """The training loss (params, extra_vars, batch) -> (loss, bn_aux).

    Applies the remat / flash-attention training options to ``apply`` and
    reproduces the reference objective: Lovász + NLL over frames 1..T-1 for
    RMNet, L1 against precomputed flows for TinyFlowNet
    (reference core/train.py:80-82,174-180)."""
    import dataclasses

    network = cfg.TRAIN.NETWORK
    ignore = cfg.CONST.IGNORE_IDX
    remat = remat if remat is not None else getattr(cfg.TRAIN, "REMAT", "step")
    if remat in (True, "step"):
        # per-frame remat: only scan carries persist; within-step encoder /
        # decoder activations recompute in the backward pass
        apply = dataclasses.replace(apply, remat=True)
    elif remat == "encoders":
        apply = dataclasses.replace(apply, remat_encoders=True)
    elif remat not in (False, "none"):
        raise ValueError(f"unknown remat mode {remat!r}")
    if getattr(cfg.TRAIN, "FLASH_ATTENTION", False):
        # differentiable block-sparse read (custom-VJP flash backward):
        # O(M) HBM traffic instead of the dense O(M*Q) affinity in BOTH
        # passes (ops/flash_attention.py; the reference trains through the
        # quadratic read via autograd, models/rmnet.py:143-165)
        apply = dataclasses.replace(apply, use_flash_attention=True)

    def rmnet_loss(params, extra_vars, batch):
        variables = {"params": params, **extra_vars}
        out = apply.forward_video(variables, batch["frames"], batch["masks"],
                                  batch["flows"], batch["n_objects"])
        # trainable BN returns the scan-threaded running stats as aux
        est, bn = out if apply.train_bn else (out, None)
        probs = est[:, 1:]  # (B, T-1, K, H, W)
        labels = jnp.argmax(batch["masks"][:, 1:], axis=2)  # (B, T-1, H, W)
        probs_cl = jnp.moveaxis(probs, 2, -1)  # channels-last
        log_probs = jnp.log(jnp.maximum(probs_cl, 1e-30))
        loss = lovasz_loss(probs_cl, labels, ignore) + nll_loss(log_probs, labels, ignore)
        return loss, bn

    def tfn_loss(params, extra_vars, batch):
        variables = {"params": params, **extra_vars}
        est_flows = tflownet.apply(variables, batch["frames"])
        return l1_loss(est_flows, batch["flows"]), None

    return rmnet_loss if network == "RMNet" else tfn_loss


def make_train_step(cfg, apply: RMNetApply, tflownet, optimizer,
                    remat: Optional[str] = None):
    """Build the jitted train step for the selected network.

    ``remat`` (default cfg.TRAIN.REMAT): "step" recomputes whole frames in
    the backward pass (minimum memory — the round-2 default, needed without
    object/batch headroom); "encoders" recomputes only the two ResNet-50
    interiors (they are the bulk of saved activations but only ~half the
    recompute; measured ~1.3x faster at reference scale, docs/PERFORMANCE.md);
    "none" saves everything (fastest when it fits).

    ``cfg.TRAIN.GRAD_ACCUM_STEPS`` > 1 scans that many micro-batches inside
    the one jitted step, averaging gradients before the single Adam update —
    effective batches past the HBM wall (B=32 at the reference crop needs
    33.2 GB vs 15.75 GB on v5e, docs/bench_logs_r05_bsweep.txt) at the
    per-micro-batch activation footprint. Note the Lovász term sorts pixels
    per micro-batch, so the accumulated gradient equals the mean of
    micro-batch gradients (the standard accumulation semantics), not the
    gradient of one fused-batch loss."""
    loss_fn = make_loss_fn(cfg, apply, tflownet, remat)
    accum = max(1, int(getattr(cfg.TRAIN, "GRAD_ACCUM_STEPS", 1)))

    def _grads_and_loss(params, extra_vars, batch):
        if accum == 1:
            (loss, bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, extra_vars, batch
            )
            return loss, bn, grads
        has_bn = "batch_stats" in extra_vars and apply.train_bn
        B0 = jax.tree_util.tree_leaves(batch)[0].shape[0]
        if B0 % accum:
            raise ValueError(
                f"TRAIN.GRAD_ACCUM_STEPS={accum} must divide the batch "
                f"size (got B={B0})"
            )
        micro = jax.tree_util.tree_map(
            lambda x: x.reshape((accum, x.shape[0] // accum) + x.shape[1:]),
            batch,
        )

        def body(carry, mb):
            gacc, ev = carry
            (l, bn_i), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, ev, mb
            )
            if has_bn:
                ev = {**ev, "batch_stats": bn_i}
            gacc = jax.tree_util.tree_map(jnp.add, gacc, g)
            return (gacc, ev), l

        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        (gsum, ev_out), losses = jax.lax.scan(body, (zeros, extra_vars), micro)
        grads = jax.tree_util.tree_map(lambda g: g / accum, gsum)
        bn = ev_out["batch_stats"] if has_bn else None
        return jnp.mean(losses), bn, grads

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, extra_vars, batch, lr):
        loss, bn, grads = _grads_and_loss(params, extra_vars, batch)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(
            params, jax.tree_util.tree_map(lambda u: -lr * u, updates)
        )
        # non-finite batch -> skip the whole update, moments included (the
        # reference try/excepts and continues, core/train.py:187-189)
        finite = jnp.isfinite(loss)

        def keep(new, old):
            return jnp.where(finite, new, old) if jnp.issubdtype(
                jnp.asarray(new).dtype, jnp.inexact
            ) else jax.lax.select(finite, jnp.asarray(new), jnp.asarray(old))

        new_params = jax.tree_util.tree_map(keep, new_params, params)
        new_opt_state = jax.tree_util.tree_map(keep, new_opt_state, opt_state)
        new_extra = extra_vars
        if bn is not None:
            new_extra = {**extra_vars, "batch_stats": jax.tree_util.tree_map(
                keep, bn, extra_vars["batch_stats"]
            )}
        return new_params, new_opt_state, new_extra, loss

    return train_step


def train_net(cfg):
    train_loader = DataLoader(
        DatasetCollector.get_dataset(cfg, cfg.DATASET.TRAIN_DATASET, DatasetSubset.TRAIN),
        batch_size=cfg.TRAIN.BATCH_SIZE,
        shuffle=True,
        drop_last=True,
        seed=cfg.CONST.RNG_SEED,
        n_workers=cfg.CONST.N_WORKERS,
    )
    val_loader = DataLoader(
        DatasetCollector.get_dataset(cfg, cfg.DATASET.TEST_DATASET, DatasetSubset.VAL),
        batch_size=1,
        shuffle=False,
        n_workers=cfg.CONST.N_WORKERS,
    )

    dtype = jnp.bfloat16 if cfg.TRAIN.BF16 else None
    rmnet, tflownet, rm_vars, tfn_vars = build_models(cfg, cfg.CONST.RNG_SEED, dtype)

    # pretrained-encoder initialization (reference models/rmnet.py:57,86 +
    # core/train.py:50-53: torchvision resnet50 trunks, kaiming heads)
    if cfg.TRAIN.BACKBONE_WEIGHTS:
        rm_vars, n_imported = load_backbone_weights(cfg.TRAIN.BACKBONE_WEIGHTS, rm_vars)
        logging.info(
            "Initialized both encoder trunks from %s (%d tensors).",
            cfg.TRAIN.BACKBONE_WEIGHTS, n_imported,
        )
    n_params_rm = sum(x.size for x in jax.tree_util.tree_leaves(rm_vars["params"]))
    n_params_tf = sum(x.size for x in jax.tree_util.tree_leaves(tfn_vars["params"]))
    logging.info("Parameters in TinyFlowNet: %d.", n_params_tf)
    logging.info("Parameters in RMNet: %d.", n_params_rm)

    apply = RMNetApply(
        rmnet,
        memorize_every=cfg.TRAIN.MEMORIZE_EVERY,
        train_bn=cfg.TRAIN.USE_BATCH_NORM,
    )
    optimizer = make_optimizer(cfg)

    init_epoch = 0
    best_metrics = None
    opt_state = None
    if cfg.CONST.WEIGHTS:
        logging.info("Recovering from %s ...", cfg.CONST.WEIGHTS)
        rm_vars, tfn_vars, extras = load_weights_auto(cfg.CONST.WEIGHTS, rm_vars, tfn_vars)
        if extras.get("best_metrics") is not None:
            best_metrics = Metrics(cfg.TEST.MAIN_METRIC_NAME, dict(extras["best_metrics"]))
        if cfg.TRAIN.RESUME_FULL_STATE and extras.get("epoch") is not None:
            init_epoch = int(extras["epoch"])
            if extras.get("opt_state") is not None:
                opt_state = extras["opt_state"]
        logging.info("Recover completed. Current epoch = #%d; best metrics = %s.",
                     init_epoch, best_metrics)

    # output dirs + code snapshot (core/train.py:100-126)
    ckpt_dir = os.path.join(cfg.DIR.OUTPUT_DIR, "checkpoints", cfg.CONST.EXP_NAME)
    log_dir = os.path.join(cfg.DIR.OUTPUT_DIR, "logs", cfg.CONST.EXP_NAME)
    snap_dir = os.path.join(cfg.DIR.OUTPUT_DIR, "snapshots")
    os.makedirs(ckpt_dir, exist_ok=True)
    os.makedirs(snap_dir, exist_ok=True)
    _snapshot_code(os.path.join(snap_dir, f"{cfg.CONST.EXP_NAME}.zip"), cfg)

    train_writer = SummaryWriter(log_dir, "train")
    val_writer = SummaryWriter(log_dir, "test")

    trained_net = cfg.TRAIN.NETWORK
    params = rm_vars["params"] if trained_net == "RMNet" else tfn_vars["params"]
    extra_vars = {
        k: v for k, v in (rm_vars if trained_net == "RMNet" else tfn_vars).items()
        if k != "params"
    }
    if opt_state is None:
        opt_state = optimizer.init(params)
    train_step = make_train_step(cfg, apply, tflownet, optimizer)

    mesh = make_mesh(cfg.TRAIN.DATA_PARALLEL) if cfg.TRAIN.DATA_PARALLEL > 1 else None

    metrics_threshold = Metrics(
        cfg.TEST.MAIN_METRIC_NAME,
        [cfg.TRAIN.CKPT_SAVE_THRESHOLD] * len(Metrics.names()),
    )

    # Preemption handling (the reference has none, SURVEY §5): on SIGTERM /
    # SIGINT finish the current batch, save ckpt-interrupt with full state,
    # and exit cleanly — resume continues the schedule.
    stop_requested = {"flag": False}

    def _request_stop(signum, frame):
        logging.warning("signal %s received — checkpointing and stopping", signum)
        stop_requested["flag"] = True

    prev_handlers = {}
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            prev_handlers[sig] = signal.signal(sig, _request_stop)
        except ValueError:  # not in main thread
            pass

    n_batches = len(train_loader)
    last_keep_epoch = -cfg.TRAIN.N_EPOCHS
    val_engine = None  # reused across epochs; weights swap without recompile
    for epoch_idx in range(init_epoch + 1, cfg.TRAIN.N_EPOCHS + 1):
        epoch_start = time.time()
        batch_time = AverageMeter()
        data_time = AverageMeter()
        losses = AverageMeter()

        # frame-step curriculum (core/train.py:146-157)
        if cfg.TRAIN.USE_RANDOM_FRAME_STEPS:
            if (
                epoch_idx >= cfg.TRAIN.EPOCH_INDEX_FIXING_FRAME_STEPS
                and epoch_idx <= last_keep_epoch + cfg.TRAIN.N_EPOCHS_KEEP_FRAME_STEPS
            ):
                max_steps = 1
            else:
                max_steps = random.randint(
                    1, min(cfg.TRAIN.MAX_FRAME_STEPS, epoch_idx // 5 + 2)
                )
            step_val = random.randint(1, max_steps)
            train_loader.dataset.set_frame_step(step_val)
            logging.info("[Epoch %d/%d] Set frame step to %d",
                         epoch_idx, cfg.TRAIN.N_EPOCHS, step_val)

        lr = cosine_lr(cfg.TRAIN.LEARNING_RATE, epoch_idx - 1, cfg.TRAIN.N_EPOCHS)

        batch_end = time.time()
        for batch_idx, (names, n_objects, frames, masks, flows) in enumerate(train_loader):
            n_itr = (epoch_idx - 1) * n_batches + batch_idx
            data_time.update(time.time() - batch_end)
            try:
                batch = {
                    "frames": frames,
                    "masks": masks.astype(np.float32),
                    "flows": flows,
                    "n_objects": n_objects,
                }
                if mesh is not None:
                    batch = shard_batch(batch, mesh)
                params, opt_state, extra_vars, loss = train_step(
                    params, opt_state, extra_vars, batch, lr
                )
                loss = float(loss)
                losses.update(loss)
            except Exception as ex:  # skip-batch robustness (core/train.py:187-189)
                logging.exception(ex)
                continue

            train_writer.add_scalar("Loss/Batch", loss, n_itr)
            batch_time.update(time.time() - batch_end)
            batch_end = time.time()
            logging.info(
                "[Epoch %d/%d][Batch %d/%d] BatchTime = %.3f (s) DataTime = %.3f (s) Loss = %.4f",
                epoch_idx, cfg.TRAIN.N_EPOCHS, batch_idx + 1, n_batches,
                batch_time.val(), data_time.val(), losses.val(),
            )
            if stop_requested["flag"]:
                break

        if stop_requested["flag"]:
            if trained_net == "RMNet":
                rm_vars = {"params": params, **extra_vars}
            else:
                tfn_vars = {"params": params, **extra_vars}
            path = save_checkpoint(ckpt_dir, "ckpt-interrupt", {
                "epoch": epoch_idx - 1,  # epoch incomplete: resume re-runs it
                "best_metrics": best_metrics.state_dict() if best_metrics else None,
                "rmnet": rm_vars,
                "tflownet": tfn_vars,
                "opt_state": opt_state,
            })
            logging.warning("Saved interrupt checkpoint to %s; exiting.", path)
            break

        train_writer.add_scalar("Loss/Epoch", losses.avg(), epoch_idx)
        logging.info("[Epoch %d/%d] EpochTime = %.3f (s) Loss = %.4f",
                     epoch_idx, cfg.TRAIN.N_EPOCHS, time.time() - epoch_start,
                     losses.avg())

        # sync trained params back into the variable dicts for evaluation
        if trained_net == "RMNet":
            rm_vars = {"params": params, **extra_vars}
        else:
            tfn_vars = {"params": params, **extra_vars}

        if val_engine is None:
            val_engine = InferenceEngine(cfg, rm_vars, tfn_vars)
        else:
            val_engine.update_weights(rm_vars, tfn_vars)
        metrics = test_net(cfg, epoch_idx, val_loader, val_writer, val_engine,
                           raise_on_total_failure=False)
        if metrics.state_dict()[cfg.TEST.MAIN_METRIC_NAME] > cfg.TRAIN.KEEP_FRAME_STEPS_THRESHOLD:
            last_keep_epoch = epoch_idx

        # gated checkpointing (core/train.py:211-231)
        state = {
            "epoch": epoch_idx,
            "best_metrics": metrics.state_dict(),
            "rmnet": rm_vars,
            "tflownet": tfn_vars,
            "opt_state": opt_state,
        }
        if epoch_idx % cfg.TRAIN.CKPT_SAVE_FREQ == 0 and metrics.better_than(metrics_threshold):
            path = save_checkpoint(ckpt_dir, "ckpt-epoch-%03d" % epoch_idx, state)
            logging.info("Saved checkpoint to %s ...", path)
        if metrics.better_than(best_metrics):
            best_metrics = metrics
            path = save_checkpoint(ckpt_dir, "ckpt-best", state)
            logging.info("Saved checkpoint to %s ...", path)

    for sig, handler in prev_handlers.items():
        signal.signal(sig, handler)
    train_writer.close()
    val_writer.close()
    return best_metrics


def _snapshot_code(zip_path: str, cfg) -> None:
    """Zip the repo source (minus outputs) per experiment
    (capability of reference core/train.py:112-126)."""
    root = os.getcwd()
    out_norm = os.path.normpath(os.path.join(root, cfg.DIR.OUTPUT_DIR))
    try:
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
            for dirname, subdirs, files in os.walk(root):
                subdirs[:] = [
                    d for d in subdirs
                    if not d.startswith(".") and d not in ("__pycache__", "output", "data")
                ]
                if os.path.normpath(dirname).startswith(out_norm):
                    continue
                for filename in files:
                    if filename.endswith((".py", ".cpp", ".md", ".json", ".txt")):
                        full = os.path.join(dirname, filename)
                        zf.write(full, os.path.relpath(full, root))
    except Exception as ex:  # snapshot failure should never kill training
        logging.warning("code snapshot failed: %s", ex)
