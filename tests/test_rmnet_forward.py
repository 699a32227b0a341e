"""Full-sequence RMNet forward parity: scan-based fixed-bank JAX forward vs
the torch golden spec of the reference per-frame loop (tests/torch_ref.py),
with identical (imported) weights. Covers: memorize -> bank growth ->
flow-warped regional query maps -> segment -> soft aggregation -> new-object
injection -> non-existing suppression."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from rmnet_tpu.models.rmnet import RMNet, RMNetApply
from rmnet_tpu.models.torch_import import import_state_dict

from tests import torch_ref as TR

B, T, K, H, W = 1, 3, 4, 48, 64
LOOSE = 8


def build_clip():
    rs = np.random.RandomState(0)
    frames = rs.rand(B, T, H, W, 3).astype(np.float32) * 2 - 1
    # object 1 from t=0; object 2 appears at t=1 (tests injection path)
    labels = np.zeros((B, T, H, W), np.uint8)
    for t in range(T):
        y = 8 + 3 * t
        labels[:, t, y:y + 14, 10:26] = 1
        if t >= 1:
            labels[:, t, y + 6:y + 22, 40:56] = 2
    masks = np.stack([(labels == k) for k in range(K)], axis=2).astype(np.float32)
    flows = np.zeros((B, T, H, W, 2), np.float32)
    flows[..., 1] = -3.0
    n_objects = np.array([[1, 2, 2]])
    return frames, masks, flows, n_objects


def test_full_forward_parity():
    frames, masks, flows, n_objects = build_clip()

    t_model = TR.RMNetT(n_bbox_loose_pixels=LOOSE).eval()
    for m in t_model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.2)
            m.running_var.uniform_(0.8, 1.4)

    j_model = RMNet()
    variables = j_model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 16, 16, 3)),
        jnp.zeros((1, 16, 16)),
        jnp.zeros((1, 16, 16)),
    )
    variables = jax.tree_util.tree_map(np.asarray, variables)
    variables, missing = import_state_dict(variables, t_model.state_dict(), "reference")
    assert not missing

    with torch.no_grad():
        est_t = t_model(
            torch.from_numpy(frames.transpose(0, 1, 4, 2, 3)),
            torch.from_numpy(masks),
            torch.from_numpy(flows.transpose(0, 1, 4, 2, 3)),
            torch.from_numpy(n_objects),
            memorize_every=1,
        ).numpy()

    apply = RMNetApply(j_model, memorize_every=1, n_bbox_loose_pixels=LOOSE)
    est_j = np.asarray(
        jax.jit(apply.forward_video)(
            variables,
            jnp.asarray(frames),
            jnp.asarray(masks),
            jnp.asarray(flows),
            jnp.asarray(n_objects),
        )
    )

    assert est_j.shape == est_t.shape == (B, T, K, H, W)
    np.testing.assert_array_equal(est_j[:, 0], est_t[:, 0])  # frame 0 = gt
    for t in range(1, T):
        np.testing.assert_allclose(
            est_j[:, t], est_t[:, t], rtol=5e-3, atol=5e-3,
            err_msg=f"frame {t} diverged",
        )
    # label agreement should be essentially total
    agree = (est_j.argmax(2) == est_t.argmax(2)).mean()
    assert agree > 0.999, agree


def test_memorize_every_bank_semantics():
    """With memorize_every=2 and T=4 the bank must hold frames {0, 2} plus
    the ephemeral prev — check the cursor/commit bookkeeping."""
    frames, masks, flows, n_objects = build_clip()
    # extend to T=4 by repeating the last frame
    frames = np.concatenate([frames, frames[:, -1:]], axis=1)
    masks = np.concatenate([masks, masks[:, -1:]], axis=1)
    flows = np.concatenate([flows, flows[:, -1:]], axis=1)
    n_objects = np.array([[1, 2, 2, 2]])

    j_model = RMNet()
    variables = j_model.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, 16, 16, 3)), jnp.zeros((1, 16, 16)), jnp.zeros((1, 16, 16)),
    )
    apply = RMNetApply(j_model, memorize_every=2, n_bbox_loose_pixels=LOOSE)
    est = jax.jit(apply.forward_video)(
        variables, jnp.asarray(frames), jnp.asarray(masks),
        jnp.asarray(flows), jnp.asarray(n_objects),
    )
    est = np.asarray(est)
    assert est.shape == (B, 4, K, H, W)
    assert np.isfinite(est).all()
    # probabilities sum to one over K everywhere
    np.testing.assert_allclose(est[:, 1:].sum(axis=2), 1.0, atol=1e-4)
