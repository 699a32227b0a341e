"""Execute the reference's OWN model code as the golden (VERDICT r4 #3).

Every other parity test compares the JAX stack against ``tests/torch_ref.py``
— a compact torch spec written here. Careful as it is, that is the builder
grading their own transcription. This file closes the loophole: it imports
the LITERAL ``/root/reference/models/rmnet.py`` and ``tiny_flownet.py``
(read-only, unmodified) with exactly two ``sys.modules`` stubs for the
dependencies that cannot exist in this environment:

  * ``torchvision.models.resnet50`` — replaced by ``torch_ref.TrunkT`` under
    torchvision attribute names (conv1/bn1/relu/maxpool/layer1..layer3);
    TrunkT is state-dict-compatible with torchvision's resnet50 (pinned by
    tests/test_backbone_init.py), so the substitution changes weights
    (random vs pretrained), never math.
  * ``reg_att_map_generator`` (the compiled CUDA module) — replaced by the
    numpy transcription of the kernel semantics (torch_ref.reg_att_map_t:
    slot-0 skip, >=0.5 threshold, n_pts<10 whole-frame fallback, +-64
    dilation; reference reg_att_map_generator.cu:15-93). The reference's own
    autograd wrapper (constant-ones straight-through backward,
    extensions/reg_att_map_generator/__init__.py:14-24) runs UNCHANGED on
    top of the stub.

Everything else — the per-frame loop with the cat-grown bank, memorize's
per-object sub-batching, warp/grid_sample, soft-aggregation, the +-16.1181
injection constants, TinyFlowNet's coarse-to-fine pyramid — is the
reference's actual control flow (models/rmnet.py:385-452,
tiny_flownet.py:84-132). The tests pin:

  1. torch_ref's RMNetT/TinyFlowNetT load the literal reference's state
     dict with strict=True (structural equivalence of the local spec);
  2. full-video forward est_masks: literal reference vs the JAX stack
     (shared weights via the .pth importer) at a geometry with REAL
     regional boxes (loose=64 strictly inside a 160x256 frame);
  3. one train-loss backward: dL/dtheta for every parameter tensor,
     literal-reference torch autograd vs jax.grad through the lax.scan
     ring-bank loop (the reference loss, core/train.py:80-82,174-180).
"""

import importlib
import sys
import types

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from rmnet_tpu.models.rmnet import RMNet, RMNetApply
from rmnet_tpu.models.tiny_flownet import TinyFlowNet
from rmnet_tpu.models.torch_import import import_state_dict

from tests import torch_ref as TR

REF_ROOT = "/root/reference"
IGNORE = 255


def _install_stubs():
    import torch.nn as nn

    if "torchvision" not in sys.modules:

        class _StubResNet50(nn.Module):
            """TrunkT re-exposed under torchvision resnet50 attribute names."""

            def __init__(self):
                super().__init__()
                t = TR.TrunkT()
                self.conv1, self.bn1 = t.conv1, t.bn1
                self.relu = nn.ReLU(inplace=True)
                self.maxpool = t.maxpool
                self.layer1, self.layer2, self.layer3 = t.res2, t.res3, t.res4

        tvm = types.ModuleType("torchvision.models")
        tvm.resnet50 = lambda pretrained=False, **kw: _StubResNet50()
        tv = types.ModuleType("torchvision")
        tv.models = tvm
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm

    if "reg_att_map_generator" not in sys.modules:
        ram = types.ModuleType("reg_att_map_generator")

        def _fwd(mask, prob_threshold, n_pts_threshold, n_bbox_loose_pixels):
            return TR.reg_att_map_t(
                mask, prob_threshold, n_pts_threshold, n_bbox_loose_pixels
            )

        ram.forward = _fwd
        sys.modules["reg_att_map_generator"] = ram


@pytest.fixture(scope="module")
def ref_models():
    """Import the literal reference model modules (read-only)."""
    _install_stubs()
    sys.path.insert(0, REF_ROOT)
    try:
        ref_rmnet = importlib.import_module("models.rmnet")
        ref_tfn = importlib.import_module("models.tiny_flownet")
    finally:
        sys.path.remove(REF_ROOT)
    return ref_rmnet, ref_tfn


def _randomize_bn_stats(model, seed=7):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.2, generator=g)
            m.running_var.uniform_(0.8, 1.4, generator=g)


def _import_into_jax(t_model):
    j_model = RMNet()
    variables = j_model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 16, 16, 3), np.float32),
        np.zeros((1, 16, 16), np.float32),
        np.zeros((1, 16, 16), np.float32),
    )
    variables = jax.tree_util.tree_map(np.asarray, variables)
    variables, missing = import_state_dict(
        variables, t_model.state_dict(), "reference"
    )
    assert not missing, f"missing: {missing}"
    return j_model, variables


def test_torch_ref_is_statedict_identical_to_reference(ref_models):
    """torch_ref's modules load the literal reference state dict strictly —
    the local spec cannot silently diverge structurally."""
    ref_rmnet, ref_tfn = ref_models
    torch.manual_seed(5)
    r = ref_rmnet.RMNet(cfg=None)
    TR.RMNetT().load_state_dict(r.state_dict(), strict=True)
    t = ref_tfn.TinyFlowNet(cfg=None)
    TR.TinyFlowNetT().load_state_dict(t.state_dict(), strict=True)


@pytest.mark.slow
def test_reference_forward_golden_regional(ref_models):
    """Literal-reference full-video forward vs JAX, REAL regional boxes.

    160x256 with ~30px objects: bbox +-64 dilation stays strictly inside
    the frame, so the /16-nearest att-map downsample, the regional k/v
    masking, and the memory-read softmax over regionally-zeroed positions
    all have nontrivial boundaries (reference models/rmnet.py:243-248,
    355-358 with the CUDA defaults 0.5/10/64).
    """
    ref_rmnet, _ = ref_models
    B, T, K, H, W = 1, 3, 3, 160, 256
    MEMORIZE_EVERY = 2

    rs = np.random.RandomState(1)
    frames = rs.rand(B, T, H, W, 3).astype(np.float32) * 2 - 1
    labels = np.zeros((B, T, H, W), np.uint8)
    for t in range(T):
        labels[:, t, 20 + 3 * t : 52 + 3 * t, 30:70] = 1
        labels[:, t, 100:138, 150 + 2 * t : 190 + 2 * t] = 2
    masks = np.stack([(labels == k) for k in range(K)], axis=2).astype(np.float32)
    flows = (rs.rand(B, T, H, W, 2).astype(np.float32) - 0.5) * 4.0
    n_objects = np.array([[2, 2, 2]], np.int32)

    torch.manual_seed(11)
    t_model = ref_rmnet.RMNet(cfg=None).eval()
    _randomize_bn_stats(t_model)

    with torch.no_grad():
        est_t = t_model(
            torch.from_numpy(frames.transpose(0, 1, 4, 2, 3)),
            torch.from_numpy(masks),
            torch.from_numpy(flows.transpose(0, 1, 4, 2, 3)),
            torch.from_numpy(n_objects),
            MEMORIZE_EVERY,
        ).numpy()

    j_model, variables = _import_into_jax(t_model)
    apply = RMNetApply(j_model, memorize_every=MEMORIZE_EVERY)
    est_j = np.asarray(
        apply.forward_video(
            variables,
            jnp.asarray(frames),
            jnp.asarray(masks),
            jnp.asarray(flows),
            jnp.asarray(n_objects),
        )
    )

    assert est_j.shape == est_t.shape == (B, T, K, H, W)
    np.testing.assert_allclose(est_j[:, 1:], est_t[:, 1:], rtol=1e-3, atol=5e-4)
    # label maps agree exactly away from the f32 softmax ties
    lab_j = np.argmax(est_j[:, 1:], axis=2)
    lab_t = np.argmax(est_t[:, 1:], axis=2)
    assert (lab_j != lab_t).mean() < 1e-3


@pytest.mark.slow
def test_reference_train_gradient_golden(ref_models):
    """dL/dtheta of the literal reference (torch autograd through the whole
    per-frame loop + the reference loss) vs jax.grad through the scan bank.

    Geometry crosses a commit boundary, a skipped commit, and a new-object
    injection (same branches as tests/test_train_grad_parity.py, whose
    golden is the local torch spec — THIS test replaces that golden with
    the reference's own code; att-map geometry uses the reference's
    hardcoded defaults, so boxes are whole-frame at 48x64 and the regional
    branch is covered by the forward test above).
    """
    from rmnet_tpu.ops import lovasz_loss, nll_loss
    from tests.test_ops_losses import torch_lovasz

    ref_rmnet, _ = ref_models
    B, T, K, H, W = 1, 4, 3, 48, 64
    MEMORIZE_EVERY = 2

    rs = np.random.RandomState(3)
    frames = rs.rand(B, T, H, W, 3).astype(np.float32) * 2 - 1
    labels = np.zeros((B, T, H, W), np.uint8)
    for t in range(T):
        labels[:, t, 8 + 2 * t : 24 + 2 * t, 10:30] = 1
        if t >= 2:  # object 2 appears at t=2 -> injection + suppression
            labels[:, t, 28:44, 36 + t : 56 + t] = 2
    masks = np.stack([(labels == k) for k in range(K)], axis=2).astype(np.float32)
    flows = (rs.rand(B, T, H, W, 2).astype(np.float32) - 0.5) * 3.0
    n_objects = np.array([[1, 1, 2, 2]], np.int32)

    torch.manual_seed(11)
    t_model = ref_rmnet.RMNet(cfg=None).eval()
    _randomize_bn_stats(t_model)

    est_t = t_model(
        torch.from_numpy(frames.transpose(0, 1, 4, 2, 3)),
        torch.from_numpy(masks),
        torch.from_numpy(flows.transpose(0, 1, 4, 2, 3)),
        torch.from_numpy(n_objects),
        MEMORIZE_EVERY,
    )
    est_probs = est_t[:, 1:].permute(0, 2, 1, 3, 4)  # (B, K, T-1, H, W)
    labels_t = torch.argmax(torch.from_numpy(masks[:, 1:]), dim=2)
    loss_t = torch_lovasz(est_probs, labels_t, IGNORE) + F.nll_loss(
        torch.log(est_probs), labels_t, ignore_index=IGNORE
    )
    loss_t.backward()

    j_model, variables = _import_into_jax(t_model)
    apply = RMNetApply(j_model, memorize_every=MEMORIZE_EVERY)
    extra = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(params):
        est = apply.forward_video(
            {"params": params, **extra},
            jnp.asarray(frames), jnp.asarray(masks), jnp.asarray(flows),
            jnp.asarray(n_objects),
        )
        probs_cl = jnp.moveaxis(est[:, 1:], 2, -1)  # (B, T-1, H, W, K)
        lab = jnp.argmax(jnp.asarray(masks)[:, 1:], axis=2)
        log_probs = jnp.log(jnp.maximum(probs_cl, 1e-30))
        return lovasz_loss(probs_cl, lab, IGNORE) + nll_loss(log_probs, lab, IGNORE)

    loss_j, grads_j = jax.value_and_grad(loss_fn)(variables["params"])
    np.testing.assert_allclose(
        float(loss_j), float(loss_t.item()), rtol=1e-5, atol=1e-6
    )

    # torch grads -> flax layout via the SAME permutations as the weights
    grad_sd = {}
    for name, p in t_model.named_parameters():
        grad_sd[name] = p.grad if p.grad is not None else torch.zeros_like(p)
    for name, b in t_model.state_dict().items():
        if name not in grad_sd:
            grad_sd[name] = torch.zeros_like(b) if b.is_floating_point() else b
    zero_tree = jax.tree_util.tree_map(np.zeros_like, variables)
    golden_tree, missing = import_state_dict(zero_tree, grad_sd, "reference")
    assert not missing
    golden = golden_tree["params"]

    flat_j = {
        "/".join(str(getattr(k, "key", k)) for k in path): np.asarray(v)
        for path, v in jax.tree_util.tree_leaves_with_path(grads_j)
    }
    flat_t = {
        "/".join(str(getattr(k, "key", k)) for k in path): np.asarray(v)
        for path, v in jax.tree_util.tree_leaves_with_path(golden)
    }
    assert set(flat_j) == set(flat_t)
    total_j = np.sqrt(sum(float((g ** 2).sum()) for g in flat_j.values()))
    assert total_j > 1e-3, "degenerate test: zero gradient"
    gnorm_max = max(np.abs(g).max() for g in flat_t.values())

    bad = []
    for name in sorted(flat_t):
        gt, gj = flat_t[name], flat_j[name]
        err = np.linalg.norm(gj - gt)
        ref = np.linalg.norm(gt)
        if err > 1e-4 * ref and np.abs(gj - gt).max() > 1e-7 * gnorm_max:
            bad.append((name, float(err / (ref + 1e-30)), float(ref)))
    assert not bad, f"{len(bad)} tensors off: {bad[:12]}"


@pytest.mark.slow
def test_reference_tinyflownet_forward_golden(ref_models):
    """Literal reference TinyFlowNet full-video forward vs the JAX module
    (reference models/tiny_flownet.py:84-132; pads /64, half-res pyramid,
    x8 bilinear upsample, backward flow t -> t-1, flow[0] = 0)."""
    _, ref_tfn = ref_models
    torch.manual_seed(2)
    t_model = ref_tfn.TinyFlowNet(cfg=None).eval()

    B, T, H, W = 1, 3, 96, 160
    rs = np.random.RandomState(4)
    frames = rs.rand(B, T, H, W, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        flows_t = t_model(
            torch.from_numpy(frames.transpose(0, 1, 4, 2, 3))
        ).numpy()  # (B, T, 2, H, W)

    j_model = TinyFlowNet()
    variables = j_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 64, 64, 3)))
    variables = jax.tree_util.tree_map(np.asarray, variables)
    variables, missing = import_state_dict(
        variables, t_model.state_dict(), "reference"
    )
    assert not missing
    flows_j = np.asarray(j_model.apply(variables, jnp.asarray(frames)))

    np.testing.assert_allclose(np.asarray(flows_j[:, 0]), 0.0)
    np.testing.assert_allclose(
        flows_j[:, 1:].transpose(0, 1, 4, 2, 3), flows_t[:, 1:],
        rtol=1e-3, atol=1e-3,
    )
