"""Realistic-shape data-parallel training equivalence (VERDICT r3 #5).

tests/test_parallel.py proves the sharding algebra at toy shapes (32^2);
this test computes the full RMNet training gradient (forward scan + BPTT
through the ring bank and the custom VJPs) at realistic geometry — B=8
sharded over the 8-device CPU mesh vs the same batch on a single device —
and asserts loss + per-tensor GRADIENT equivalence. Gradients (not
post-Adam params) are compared because Adam's first step is elementwise
scale-invariant: a missing cross-device mean would be invisible in the
updated parameters but is glaring in dL/dtheta.

Geometry: B=8, T=3, K=3 (2 objects + bg). Spatial size defaults to 96^2:
larger defaults were measured on this 1-CPU box and cut for suite budget
(240^2 > 50 min, 160^2 ~40 min; the full 240x432 would be hours) — 96^2
keeps every shape property that distinguishes this from the 32^2 toy test:
full-depth ResNet-50 stacks, a 6x6 multi-position /16 attention grid, the
ring bank in the scan carry, and a per-device share of B=1.
RMNET_FULL_DP_TEST=1 runs the full 240x432 geometry when wall-clock is no
object (e.g. a one-off on a many-core host).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rmnet_tpu.config import Config
from rmnet_tpu.core.engine import build_models
from rmnet_tpu.core.train import make_loss_fn
from rmnet_tpu.models.rmnet import RMNetApply
from rmnet_tpu.parallel import make_mesh

B, T, K = 8, 3, 3
FULL = os.environ.get("RMNET_FULL_DP_TEST") == "1"
H = 240 if FULL else 96
W = 432 if FULL else 96


def _batch():
    rs = np.random.RandomState(0)
    labels = np.zeros((B, T, H, W), np.uint8)
    for b in range(B):  # layout proportional to the (configurable) frame
        y, x = H // 12 + 2 * b, W // 14 + 2 * b
        labels[b, :, y : y + H // 3, x : x + W // 4] = 1
        labels[b, :, H // 2 : H * 5 // 6, W // 2 + b : W * 9 // 10 + b] = 2
    masks = np.stack([(labels == k) for k in range(K)], 2).astype(np.float32)
    return {
        "frames": rs.rand(B, T, H, W, 3).astype(np.float32) * 2 - 1,
        "masks": masks,
        "flows": (rs.rand(B, T, H, W, 2).astype(np.float32) - 0.5) * 4,
        "n_objects": np.full((B, T), K - 1, np.int32),
    }


@pytest.mark.slow
def test_dp_train_gradient_realistic_shape_matches_single_device():
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert len(jax.devices()) == 8

    cfg = Config()
    cfg.TRAIN.NETWORK = "RMNet"
    rmnet, tflownet, rm_vars, _ = build_models(cfg, 0)
    apply = RMNetApply(rmnet, memorize_every=cfg.TRAIN.MEMORIZE_EVERY)
    # remat="encoders": the TRAIN.REMAT production default (selective
    # encoder-interior recompute — fastest AND smallest, docs/PERFORMANCE.md)
    loss_fn = make_loss_fn(cfg, apply, tflownet, remat="encoders")

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    batch = _batch()
    params = rm_vars["params"]
    extra = {k: v for k, v in rm_vars.items() if k != "params"}

    # single-device reference (device 0)
    dev0 = jax.devices()[0]
    (loss1, _), g1 = grad_fn(
        jax.device_put(params, dev0), jax.device_put(extra, dev0),
        {k: jax.device_put(v, dev0) for k, v in batch.items()},
    )
    loss1 = float(loss1)
    g1 = jax.tree_util.tree_map(np.asarray, g1)

    # 8-device data parallel: batch sharded, params replicated (GSPMD
    # inserts the gradient all-reduce)
    mesh = make_mesh(8)
    shard = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    (loss8, _), g8 = grad_fn(
        jax.device_put(params, repl), jax.device_put(extra, repl),
        {k: jax.device_put(v, shard) for k, v in batch.items()},
    )
    loss8 = float(loss8)

    assert np.isfinite(loss1) and loss1 > 0
    # 5e-5: the sharded loss reduces per-device partial sums in a different
    # order than the single-device sum (measured rel diff ~2.6e-5 at 96^2 f32);
    # the per-tensor gradient comparison below is the load-bearing assertion
    np.testing.assert_allclose(loss8, loss1, rtol=5e-5)

    flat1 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(g1)}
    flat8 = {jax.tree_util.keystr(k): np.asarray(v)
             for k, v in jax.tree_util.tree_leaves_with_path(g8)}
    assert set(flat1) == set(flat8)
    gmax = max(np.abs(v).max() for v in flat1.values())
    assert gmax > 0, "degenerate: zero gradient"
    bad = []
    for name in sorted(flat1):
        a, b = flat8[name], flat1[name]
        err = np.linalg.norm(a - b)
        ref = np.linalg.norm(b)
        # per-tensor norm-relative error; absolute escape at float-noise
        # scale relative to the model-wide gradient magnitude. 5e-4: the
        # measured worst at 96^2 is 1.85e-4 on encoder_query conv1 — the
        # LONGEST backprop accumulation chain, where per-device partial-sum
        # order differences compound; a missing all-reduce/mean would show
        # as O(1) error across many tensors, so discrimination is intact.
        if err > 5e-4 * ref and np.abs(a - b).max() > 1e-6 * gmax:
            bad.append((name, float(err / (ref + 1e-30))))
    assert not bad, f"{len(bad)} tensors off: {bad[:10]}"
