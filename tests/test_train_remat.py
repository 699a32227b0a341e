"""Remat modes must be numerically equivalent — they only trade memory for
recompute (VERDICT round-2 directive #2: selective remat of the encoder
interiors instead of whole-step recompute)."""

import numpy as np

import jax
import jax.numpy as jnp

from rmnet_tpu.config import Config
from rmnet_tpu.core.engine import build_models
from rmnet_tpu.core.train import make_optimizer, make_train_step
from rmnet_tpu.models.rmnet import RMNetApply


def _one_step(remat, use_bn=False):
    cfg = Config()
    cfg.TRAIN.USE_BATCH_NORM = use_bn
    rmnet, tflownet, rm_vars, _ = build_models(cfg, 0)
    apply = RMNetApply(rmnet, memorize_every=1, train_bn=use_bn)
    optimizer = make_optimizer(cfg)
    params = rm_vars["params"]
    extra = {k: v for k, v in rm_vars.items() if k != "params"}
    opt_state = optimizer.init(params)
    step = make_train_step(cfg, apply, tflownet, optimizer, remat=remat)

    B, T, K, HW = 1, 3, 3, 48
    rs = np.random.RandomState(0)
    labels = rs.randint(0, K, (B, T, HW, HW))
    batch = {
        "frames": jnp.asarray(rs.rand(B, T, HW, HW, 3).astype(np.float32)),
        "masks": jnp.asarray(
            np.moveaxis(np.eye(K, dtype=np.float32)[labels], -1, 2)
        ),
        "flows": jnp.asarray(
            (rs.rand(B, T, HW, HW, 2).astype(np.float32) - 0.5) * 4
        ),
        "n_objects": jnp.full((B, T), K - 1, jnp.int32),
    }
    new_params, _, _, loss = step(params, opt_state, extra, batch, jnp.asarray(1e-5))
    leaf = jax.tree_util.tree_leaves(new_params)[0]
    return float(loss), np.asarray(leaf)


def test_remat_modes_equivalent():
    loss_step, leaf_step = _one_step("step")
    loss_enc, leaf_enc = _one_step("encoders")
    loss_none, leaf_none = _one_step("none")
    assert np.isfinite(loss_step)
    np.testing.assert_allclose(loss_enc, loss_step, rtol=1e-5)
    np.testing.assert_allclose(loss_none, loss_step, rtol=1e-5)
    np.testing.assert_allclose(leaf_enc, leaf_step, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(leaf_none, leaf_step, rtol=1e-4, atol=1e-6)


def test_remat_encoders_equivalent_under_trainable_bn():
    """Encoder remat must stay ACTIVE (not a silent no-op) with trainable
    BN: jax.checkpoint wraps the mutable batch_stats apply, so the update
    remains numerically identical to the no-remat BN step."""
    loss_enc, leaf_enc = _one_step("encoders", use_bn=True)
    loss_none, leaf_none = _one_step("none", use_bn=True)
    assert np.isfinite(loss_enc)
    np.testing.assert_allclose(loss_enc, loss_none, rtol=1e-5)
    np.testing.assert_allclose(leaf_enc, leaf_none, rtol=1e-4, atol=1e-6)


def test_grad_accumulation_matches_mean_of_microbatch_grads():
    """TRAIN.GRAD_ACCUM_STEPS=2 must produce EXACTLY the update of averaging
    the two micro-batch gradients and applying one Adam step (the documented
    accumulation semantics — Lovász sorts per micro-batch, so this is NOT
    the fused-batch loss gradient)."""
    from rmnet_tpu.core.train import make_loss_fn
    import optax

    cfg = Config()
    rmnet, tflownet, rm_vars, _ = build_models(cfg, 0)
    apply = RMNetApply(rmnet, memorize_every=1)
    optimizer = make_optimizer(cfg)
    params = rm_vars["params"]
    extra = {k: v for k, v in rm_vars.items() if k != "params"}

    B, T, K, HW = 2, 3, 3, 48
    rs = np.random.RandomState(1)
    labels = rs.randint(0, K, (B, T, HW, HW))
    batch = {
        "frames": jnp.asarray(rs.rand(B, T, HW, HW, 3).astype(np.float32)),
        "masks": jnp.asarray(
            np.moveaxis(np.eye(K, dtype=np.float32)[labels], -1, 2)
        ),
        "flows": jnp.asarray(
            (rs.rand(B, T, HW, HW, 2).astype(np.float32) - 0.5) * 4
        ),
        "n_objects": jnp.full((B, T), K - 1, jnp.int32),
    }
    lr = jnp.asarray(1e-5)

    cfg.TRAIN.GRAD_ACCUM_STEPS = 2
    step = make_train_step(cfg, apply, tflownet, optimizer, remat="encoders")
    new_params, _, _, loss = step(
        params, optimizer.init(params), extra, batch, lr
    )

    # manual golden: grad of each single-sample micro-batch, averaged
    loss_fn = make_loss_fn(cfg, apply, tflownet, remat="encoders")
    half = lambda i: jax.tree_util.tree_map(lambda x: x[i : i + 1], batch)
    (l0, _), g0 = jax.value_and_grad(loss_fn, has_aux=True)(params, extra, half(0))
    (l1, _), g1 = jax.value_and_grad(loss_fn, has_aux=True)(params, extra, half(1))
    grads = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0, g0, g1)
    updates, _ = optimizer.update(grads, optimizer.init(params), params)
    golden = optax.apply_updates(
        params, jax.tree_util.tree_map(lambda u: -lr * u, updates)
    )

    np.testing.assert_allclose(float(loss), float((l0 + l1) / 2), rtol=1e-6)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(new_params),
        jax.tree_util.tree_leaves_with_path(golden),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7,
            err_msg=str(pa),
        )

    # divisibility is a hard error, not silent truncation
    cfg.TRAIN.GRAD_ACCUM_STEPS = 3
    step3 = make_train_step(cfg, apply, tflownet, optimizer, remat="encoders")
    import pytest

    with pytest.raises(ValueError, match="GRAD_ACCUM_STEPS"):
        step3(params, optimizer.init(params), extra, batch, lr)
