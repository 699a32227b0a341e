"""FULL-MODEL training-gradient parity vs the torch spec (VERDICT r3 #2).

The reference's training gradient is plain torch autograd through the whole
per-frame loop (reference models/rmnet.py:385-452 + core/train.py:174-186).
This repo replaces it with three hand-written custom VJPs (att-map
straight-through, fused warp splat, Lovász keyed-sort) plus lax.scan BPTT
and a fixed-capacity ring bank. Each VJP is unit-fuzzed elsewhere; THIS test
checks the COMPOSITION: one train step's dL/dθ for every RMNet parameter
tensor against torch autograd on tests/torch_ref.py with shared (imported)
weights and the reference loss (Lovász + NLL on frames 1..T-1,
core/train.py:80-82,174-180).

Geometry is chosen to cross every training-relevant branch in one step:
T=4 with memorize_every=2 spans a commit boundary (frame 2 commits at t=3)
AND a skipped commit (frame 1 stays ephemeral at t=2), and object 2 appears
at t=2 — exercising new-object injection (logit overwrite breaks grad flow
through that slot/frame) and pre-appearance suppression (-16.1181 constant).

Gradient mapping trick: torch grads transform into flax layout by the SAME
element-wise permutations as weights (OIHW->HWIO etc.), so we reuse
models/torch_import.import_state_dict on a state dict whose parameter
entries are replaced by their .grad.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from rmnet_tpu.models.rmnet import RMNet, RMNetApply
from rmnet_tpu.models.torch_import import import_state_dict
from rmnet_tpu.ops import lovasz_loss, nll_loss

from tests import torch_ref as TR
from tests.test_ops_losses import torch_lovasz

B, T, K, H, W = 1, 4, 3, 48, 64  # divisible by 16: no-padding path
LOOSE = 6          # bbox dilation scaled to the tiny frame
MEMORIZE_EVERY = 2 # commits at t-1 in {0, 2}; frame 1 stays ephemeral
IGNORE = 255


def _build_clip():
    rs = np.random.RandomState(3)
    frames = rs.rand(B, T, H, W, 3).astype(np.float32) * 2 - 1
    labels = np.zeros((B, T, H, W), np.uint8)
    for t in range(T):
        labels[:, t, 8 + 2 * t: 24 + 2 * t, 10:30] = 1
        if t >= 2:  # object 2 appears at t=2 -> injection + suppression
            labels[:, t, 28:44, 36 + t: 56 + t] = 2
    masks = np.stack([(labels == k) for k in range(K)], axis=2).astype(np.float32)
    flows = ((rs.rand(B, T, H, W, 2).astype(np.float32)) - 0.5) * 3.0
    n_objects = np.array([[1, 1, 2, 2]], np.int32)
    return frames, masks, flows, n_objects


@pytest.mark.slow
def test_full_model_train_gradient_matches_torch_autograd():
    frames, masks, flows, n_objects = _build_clip()

    torch.manual_seed(11)
    t_model = TR.RMNetT(n_bbox_loose_pixels=LOOSE).eval()  # frozen BN
    for m in t_model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.2)
            m.running_var.uniform_(0.8, 1.4)

    j_model = RMNet()
    variables = j_model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 16, 16, 3), np.float32),
        np.zeros((1, 16, 16), np.float32),
        np.zeros((1, 16, 16), np.float32),
    )
    variables = jax.tree_util.tree_map(np.asarray, variables)
    variables, missing = import_state_dict(variables, t_model.state_dict(), "reference")
    assert not missing

    # ---- torch golden: full-loop autograd (BPTT through est_masks)
    f_t = torch.from_numpy(frames.transpose(0, 1, 4, 2, 3))
    m_t = torch.from_numpy(masks)
    fl_t = torch.from_numpy(flows.transpose(0, 1, 4, 2, 3))
    est_t = t_model(f_t, m_t, fl_t, torch.from_numpy(n_objects), MEMORIZE_EVERY)
    est_probs = est_t[:, 1:].permute(0, 2, 1, 3, 4)  # (B, K, T-1, H, W)
    labels_t = torch.argmax(m_t[:, 1:], dim=2)       # (B, T-1, H, W)
    loss_t = torch_lovasz(est_probs, labels_t, IGNORE) + F.nll_loss(
        torch.log(est_probs), labels_t, ignore_index=IGNORE
    )
    loss_t.backward()

    # ---- JAX: the exact rmnet_loss make_train_step differentiates
    apply = RMNetApply(j_model, memorize_every=MEMORIZE_EVERY,
                       n_bbox_loose_pixels=LOOSE)
    extra = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(params):
        est = apply.forward_video(
            {"params": params, **extra},
            jnp.asarray(frames), jnp.asarray(masks), jnp.asarray(flows),
            jnp.asarray(n_objects),
        )
        probs_cl = jnp.moveaxis(est[:, 1:], 2, -1)         # (B,T-1,H,W,K)
        labels = jnp.argmax(jnp.asarray(masks)[:, 1:], axis=2)
        log_probs = jnp.log(jnp.maximum(probs_cl, 1e-30))
        return lovasz_loss(probs_cl, labels, IGNORE) + nll_loss(
            log_probs, labels, IGNORE
        )

    loss_j, grads_j = jax.value_and_grad(loss_fn)(variables["params"])

    # losses agree first (cheap composition check before the grad sweep)
    np.testing.assert_allclose(float(loss_j), float(loss_t.item()),
                               rtol=1e-5, atol=1e-6)

    # ---- map torch grads into the flax layout via the weight importer
    # (grads transform by the same element-wise permutations as weights)
    grad_sd = {}
    for name, p in t_model.named_parameters():
        grad_sd[name] = p.grad if p.grad is not None else torch.zeros_like(p)
    for name, b in t_model.state_dict().items():  # stats -> zeros (unused)
        if name not in grad_sd:
            grad_sd[name] = torch.zeros_like(b) if b.is_floating_point() else b
    zero_tree = jax.tree_util.tree_map(np.zeros_like, variables)
    golden_tree, missing = import_state_dict(zero_tree, grad_sd, "reference")
    assert not missing
    golden = golden_tree["params"]

    flat_j = {"/".join(map(str, [getattr(k, "key", k) for k in path])): np.asarray(v)
              for path, v in jax.tree_util.tree_leaves_with_path(grads_j)}
    flat_t = {"/".join(map(str, [getattr(k, "key", k) for k in path])): np.asarray(v)
              for path, v in jax.tree_util.tree_leaves_with_path(golden)}
    assert set(flat_j) == set(flat_t)

    total_j = np.sqrt(sum(float((g ** 2).sum()) for g in flat_j.values()))
    assert total_j > 1e-3, "degenerate test: zero gradient"
    gnorm_max = max(np.abs(g).max() for g in flat_t.values())

    bad = []
    for name in sorted(flat_t):
        gt, gj = flat_t[name], flat_j[name]
        err = np.linalg.norm(gj - gt)
        ref = np.linalg.norm(gt)
        # per-tensor relative error (VERDICT bar: <= 1e-4), with an absolute
        # escape for tensors whose reference grad is ~zero relative to the
        # model-wide gradient scale (pure float noise otherwise)
        if err > 1e-4 * ref and np.abs(gj - gt).max() > 1e-7 * gnorm_max:
            bad.append((name, float(err / (ref + 1e-30)), float(ref)))
    assert not bad, f"{len(bad)} tensors off: {bad[:12]}"
