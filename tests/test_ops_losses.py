"""Golden tests for losses vs torch reference implementations."""

import math

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from rmnet_tpu.ops import lovasz_loss, nll_loss, l1_loss, focal_loss


def torch_lovasz(input_t, target_t, ignore_index=255):
    """Golden with the semantics of reference models/lovasz_loss.py:18-106."""
    B, C, FF, H, W = input_t.size()
    inp = input_t.permute(0, 2, 3, 4, 1).contiguous().view(-1, C)
    tgt = target_t.view(-1)
    valid = tgt.ne(ignore_index).nonzero(as_tuple=False).squeeze()
    inp, tgt = inp[valid], tgt[valid]
    if inp.numel() == 0:
        return inp * 0.0
    losses = []
    for c in range(C):
        fg = (tgt == c).float()
        if fg.sum() == 0:
            continue
        errors = (fg - inp[:, c]).abs()
        errors_sorted, perm = torch.sort(errors, 0, descending=True)
        fg_sorted = fg[perm.data]
        p = len(fg_sorted)
        gts = fg_sorted.sum()
        intersection = gts - fg_sorted.float().cumsum(0)
        union = gts + (1 - fg_sorted).float().cumsum(0)
        jaccard = 1.0 - intersection / union
        if p > 1:
            jaccard[1:p] = jaccard[1:p] - jaccard[0:-1]
        losses.append(torch.dot(errors_sorted, jaccard))
    if not losses:
        return torch.tensor(0.0)
    acc = losses[0]
    for v in losses[1:]:
        acc = acc + v
    return acc / len(losses)


def test_lovasz_matches_torch():
    rs = np.random.RandomState(0)
    B, C, FF, H, W = 2, 3, 2, 13, 17
    logits = rs.rand(B, C, FF, H, W).astype(np.float32)
    probs = torch.softmax(torch.from_numpy(logits), dim=1)
    labels = rs.randint(0, C, size=(B, FF, H, W)).astype(np.int64)
    labels[0, 0, :3, :] = 255  # some void pixels
    golden = torch_lovasz(probs, torch.from_numpy(labels)).item()

    # channels-last layout for our op
    j = lovasz_loss(
        jnp.asarray(probs.numpy().transpose(0, 2, 3, 4, 1)),
        jnp.asarray(labels),
        ignore_index=255,
    )
    assert math.isclose(float(j), golden, rel_tol=1e-4, abs_tol=1e-5)


def test_lovasz_gradient_matches_torch():
    """The custom VJP (one variadic sort + one scatter, round-3 train-perf
    work) must reproduce torch autograd through the reference formulation:
    grad flows only through errors_sorted; perm and the Lovász-grad vector
    are detached (reference models/lovasz_loss.py:45-48)."""
    import jax

    rs = np.random.RandomState(3)
    B, C, FF, H, W = 2, 4, 2, 11, 13
    logits = rs.rand(B, C, FF, H, W).astype(np.float32)
    probs_t = torch.softmax(torch.from_numpy(logits), dim=1).detach()
    probs_t.requires_grad_(True)
    labels = rs.randint(0, C, size=(B, FF, H, W)).astype(np.int64)
    labels[0, 0, :2, :] = 255  # void pixels must get zero gradient
    torch_lovasz(probs_t, torch.from_numpy(labels)).backward()
    golden = probs_t.grad.numpy()  # (B, C, F, H, W)

    grad_fn = jax.grad(
        lambda p: lovasz_loss(p, jnp.asarray(labels), ignore_index=255)
    )
    j = np.asarray(grad_fn(jnp.asarray(probs_t.detach().numpy()
                                       .transpose(0, 2, 3, 4, 1))))
    np.testing.assert_allclose(
        j, golden.transpose(0, 2, 3, 4, 1), rtol=1e-4, atol=1e-6
    )


def test_lovasz_missing_class_skipped():
    # class 2 absent -> only classes 0,1 averaged (reference skips fg.sum()==0)
    rs = np.random.RandomState(1)
    B, C, FF, H, W = 1, 4, 1, 9, 9
    probs = torch.softmax(torch.from_numpy(rs.rand(B, C, FF, H, W).astype(np.float32)), 1)
    labels = rs.randint(0, 2, size=(B, FF, H, W)).astype(np.int64)
    golden = torch_lovasz(probs, torch.from_numpy(labels)).item()
    j = lovasz_loss(
        jnp.asarray(probs.numpy().transpose(0, 2, 3, 4, 1)), jnp.asarray(labels)
    )
    assert math.isclose(float(j), golden, rel_tol=1e-4, abs_tol=1e-5)


def test_nll_matches_torch():
    rs = np.random.RandomState(2)
    B, C, H, W = 2, 5, 11, 7
    logp = torch.log_softmax(torch.from_numpy(rs.rand(B, C, H, W).astype(np.float32)), 1)
    labels = rs.randint(0, C, size=(B, H, W)).astype(np.int64)
    labels[0, 0] = 255
    golden = F.nll_loss(logp, torch.from_numpy(labels), ignore_index=255).item()
    j = nll_loss(
        jnp.asarray(logp.numpy().transpose(0, 2, 3, 1)), jnp.asarray(labels), 255
    )
    assert math.isclose(float(j), golden, rel_tol=1e-5, abs_tol=1e-6)


def test_l1_matches_torch():
    rs = np.random.RandomState(3)
    a = rs.rand(3, 4, 5).astype(np.float32)
    b = rs.rand(3, 4, 5).astype(np.float32)
    golden = F.l1_loss(torch.from_numpy(a), torch.from_numpy(b)).item()
    assert math.isclose(float(l1_loss(jnp.asarray(a), jnp.asarray(b))), golden, rel_tol=1e-6)


def torch_focal(input_t, target_t, top_k, ignore_index, step_percent=0.0):
    """Golden with the semantics of reference models/focal_loss.py:12-31."""
    B, K, N, H, W = input_t.shape
    step_percent = min(step_percent, 1.0)
    inp = input_t.permute(0, 2, 1, 3, 4).reshape(B * N, K, H * W)
    tgt = target_t.reshape(B * N, H * W)
    nll = F.nll_loss(inp, tgt, ignore_index=ignore_index, reduction="none")
    n_pixels = H * W
    n_top_k = int(step_percent * top_k * n_pixels + (1 - step_percent) * n_pixels)
    top, _ = torch.topk(nll, k=n_top_k)
    return torch.mean(top)


def test_focal_matches_torch():
    rs = np.random.RandomState(4)
    B, K, N, H, W = 2, 4, 3, 9, 11
    logp = torch.log_softmax(torch.from_numpy(rs.rand(B, K, N, H, W).astype(np.float32)), 1)
    labels = rs.randint(0, K, size=(B, N, H, W)).astype(np.int64)
    labels[1, 2, 4] = 255
    for step in (0.0, 0.5, 1.0):
        golden = torch_focal(logp, torch.from_numpy(labels), 0.3, 255, step).item()
        j = focal_loss(
            jnp.asarray(logp.numpy().transpose(0, 2, 3, 4, 1)),
            jnp.asarray(labels),
            top_k=0.3,
            ignore_index=255,
            step_percent=step,
        )
        assert math.isclose(float(j), golden, rel_tol=1e-5, abs_tol=1e-6), step


def test_nll_neg_inf_off_label_columns():
    """-inf log-probs in non-label columns (exp underflow in log_softmax) and
    at ignored pixels must not poison the mean: the one-hot contraction
    selects, it does not multiply (0 * -inf = NaN)."""
    logp = np.log(np.array([[0.7, 0.3, 0.0], [0.2, 0.8, 0.0]], np.float32))
    labels = np.array([0, 1])
    j = float(nll_loss(jnp.asarray(logp), jnp.asarray(labels), 255))
    golden = -(math.log(0.7) + math.log(0.8)) / 2
    assert math.isclose(j, golden, rel_tol=1e-6)
    # an ignored pixel whose row is all -inf contributes nothing
    logp2 = np.vstack([logp, np.full((1, 3), -np.inf, np.float32)])
    labels2 = np.array([0, 1, 255])
    j2 = float(nll_loss(jnp.asarray(logp2), jnp.asarray(labels2), 255))
    assert math.isclose(j2, golden, rel_tol=1e-6)


def test_lovasz_gradient_fuzz_vs_torch():
    """Custom-VJP gradient == torch autograd across random shapes, void
    densities, and missing-class patterns (the single-config grad test
    can miss permutation edge cases in the keyed-sort backward)."""
    import jax

    rng = np.random.RandomState(42)
    for trial in range(5):
        B = int(rng.randint(1, 3))
        C = int(rng.randint(2, 5))
        FF = int(rng.randint(1, 3))
        H = int(rng.randint(5, 14))
        W = int(rng.randint(5, 14))
        logits = rng.rand(B, C, FF, H, W).astype(np.float32)
        probs_t = torch.softmax(torch.from_numpy(logits), dim=1).detach()
        probs_t.requires_grad_(True)
        # labels drawn from a SUBSET of classes (some classes absent), with
        # random void pixels
        hi = int(rng.randint(1, C + 1))
        labels = rng.randint(0, hi, size=(B, FF, H, W)).astype(np.int64)
        void = rng.rand(B, FF, H, W) < rng.choice([0.0, 0.1, 0.5])
        labels[void] = 255
        torch_lovasz(probs_t, torch.from_numpy(labels)).backward()
        golden = probs_t.grad.numpy()

        grad_fn = jax.grad(
            lambda p: lovasz_loss(p, jnp.asarray(labels), ignore_index=255)
        )
        j = np.asarray(grad_fn(jnp.asarray(
            probs_t.detach().numpy().transpose(0, 2, 3, 4, 1))))
        np.testing.assert_allclose(
            j, golden.transpose(0, 2, 3, 4, 1), rtol=1e-4, atol=1e-6,
            err_msg=f"trial={trial} B={B} C={C} F={FF} H={H} W={W} hi={hi}",
        )
