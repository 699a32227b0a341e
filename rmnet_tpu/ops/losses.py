"""Training losses: Lovász-Softmax, NLL, L1, top-k focal (OHEM-style).

Parity notes vs the reference:
  * LovaszLoss (models/lovasz_loss.py:18-106): multi-class Lovász-Softmax.
    The reference gathers out void (ignore_index) pixels; under jit that is a
    dynamic shape, so we instead force void pixels' errors to 0 and their fg
    indicator to 0 — they sort to the tail of the descending error sort and
    contribute exactly 0 to the ``errors_sorted . lovasz_grad`` dot product,
    reproducing the gathered result (tested against a torch golden impl).
  * nll_loss mirrors torch.nn.NLLLoss(ignore_index=...), mean over
    non-ignored elements.
  * focal_loss mirrors models/focal_loss.py:12-31 (top-k of per-pixel NLL;
    defined-but-unused by reference training — provided for capability parity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _lovasz_grad_from_sorted(fg_sorted: jnp.ndarray) -> jnp.ndarray:
    """Gradient of the Lovász extension w.r.t. sorted errors (Alg. 1)."""
    gts = jnp.sum(fg_sorted)
    intersection = gts - jnp.cumsum(fg_sorted, axis=0)
    union = gts + jnp.cumsum(1.0 - fg_sorted, axis=0)
    jaccard = 1.0 - intersection / union
    # jaccard[1:] - jaccard[:-1], keeping jaccard[0]
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]], axis=0)


def _lovasz_forward(probs, labels, ignore_index):
    C = probs.shape[-1]
    flat_p = probs.reshape(-1, C).astype(jnp.float32)
    flat_l = labels.reshape(-1)
    valid = flat_l != ignore_index
    N = flat_p.shape[0]
    iota = jnp.arange(N, dtype=jnp.int32)

    def class_fwd(c):
        fg = ((flat_l == c) & valid).astype(jnp.float32)
        errors = jnp.abs(fg - flat_p[:, c])
        errors = jnp.where(valid, errors, 0.0)  # void pixels sort to the tail
        # ONE variadic sort: keys (-errors, iota) give a stable descending
        # error order (== argsort(-errors)); fg rides along, replacing the
        # reference's sort + two permutation gathers
        neg_s, idx_s, fg_s = jax.lax.sort((-errors, iota, fg), num_keys=2)
        g = _lovasz_grad_from_sorted(fg_s)
        present = jnp.sum(fg) > 0
        loss_c = jnp.where(present, jnp.dot(-neg_s, g), 0.0)
        return loss_c, present, idx_s, g

    losses, present, idx_s, g = jax.vmap(class_fwd)(jnp.arange(C))
    n_present = jnp.sum(present.astype(jnp.float32))
    loss = jnp.where(
        n_present > 0, jnp.sum(losses) / jnp.maximum(n_present, 1.0), 0.0
    )
    return loss, (flat_p, flat_l, valid, present, idx_s, g, n_present)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def lovasz_loss(
    probs: jnp.ndarray, labels: jnp.ndarray, ignore_index: int = 255
) -> jnp.ndarray:
    """Multi-class Lovász-Softmax loss.

    Args:
      probs: (..., C) class probabilities in [0, 1] (channels-last; callers
        with reference (B, C, F, H, W) layout should move C last).
      labels: (...) int labels in [0, C-1] or ``ignore_index``.

    Returns: scalar loss (mean over classes present in ``labels``).

    Custom VJP: the reference detaches the Lovász-grad vector
    (models/lovasz_loss.py:48 computes ``dot(errors_sorted, _lovasz_grad(
    fg_sorted))`` where perm and fg are constants), so the exact gradient is
    the constant vector g un-permuted to pixel order times d|fg - p|/dp.
    Expressing that directly (one scatter per class) instead of
    differentiating through the sort cut the measured train-step Lovász
    cost — autodiff of the sort materializes a second permutation pass.
    """
    return _lovasz_forward(probs, labels, ignore_index)[0]


def _lovasz_fwd(probs, labels, ignore_index):
    loss, res = _lovasz_forward(probs, labels, ignore_index)
    # residuals must be JAX types: shapes/dtypes ride on labels itself and a
    # 0-sized probe of probs' dtype
    return loss, (res, labels, jnp.zeros((0,), probs.dtype))


def _lovasz_bwd(ignore_index, saved, ct):
    (flat_p, flat_l, valid, present, idx_s, g, n_present), labels, dt = saved
    p_dtype = dt.dtype
    l_shape = labels.shape
    C, N = idx_s.shape
    p_shape = l_shape + (C,)
    # un-permute g to pixel order: g_at[c, idx_s[c, j]] = g[c, j]. idx_s is
    # a permutation of 0..N-1, so sorting (idx_s, g) by idx_s IS the inverse
    # permutation — and the TPU sort (~39 ms at these shapes) beats the
    # equivalent 1.8M-element scatter (~52 ms; tools/perf_micro.py lovasz)
    _, g_at = jax.lax.sort((idx_s, g), num_keys=1)
    fg = (flat_l[None, :] == jnp.arange(C)[:, None]) & valid[None]
    # d|fg - p|/dp = sign(p - fg); torch matches (sign(0) = 0)
    dsign = jnp.sign(flat_p.T - fg.astype(jnp.float32))
    scale = jnp.where(n_present > 0, 1.0 / jnp.maximum(n_present, 1.0), 0.0)
    gp = g_at * dsign * valid[None].astype(jnp.float32)
    gp = gp * present[:, None].astype(jnp.float32) * (scale * ct)
    grad_probs = gp.T.reshape(p_shape).astype(p_dtype)
    return grad_probs, np.zeros(l_shape, jax.dtypes.float0)


lovasz_loss.defvjp(_lovasz_fwd, _lovasz_bwd)


def nll_loss(
    log_probs: jnp.ndarray, labels: jnp.ndarray, ignore_index: int = 255
) -> jnp.ndarray:
    """torch.nn.NLLLoss parity: mean of -log_probs[label] over non-ignored.

    Args:
      log_probs: (..., C) log-probabilities, channels-last.
      labels: (...) int labels.
    """
    C = log_probs.shape[-1]
    flat_lp = log_probs.reshape(-1, C)
    flat_l = labels.reshape(-1)
    valid = flat_l != ignore_index
    # one-hot contraction instead of a per-pixel gather: C multiplies/pixel
    # beat a 1.8M-index random-access gather (and its scatter transpose in
    # the backward pass) on TPU — measured in the round-3 train bisection
    onehot = (
        flat_l[:, None] == jnp.arange(C, dtype=flat_l.dtype)[None]
    ) & valid[:, None]
    # select (not multiply) so -inf log-probs in non-label/ignored columns
    # stay out of the sum instead of producing 0 * -inf = NaN
    losses = -jnp.sum(jnp.where(onehot, flat_lp, 0), axis=-1)
    n = jnp.sum(valid)
    return jnp.sum(losses) / jnp.maximum(n, 1)


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.L1Loss parity: mean absolute error."""
    return jnp.mean(jnp.abs(pred - target))


def focal_loss(
    log_probs: jnp.ndarray,
    labels: jnp.ndarray,
    top_k: float,
    ignore_index: int = 255,
    step_percent: float = 0.0,
) -> jnp.ndarray:
    """Top-k (OHEM-like) NLL, mirroring reference models/focal_loss.py:12-31.

    Args:
      log_probs: (B, N, H, W, K) per-frame class log-probs, channels-last
        (the reference uses (B, K, N, H, W) and permutes internally).
      labels: (B, N, H, W) int labels.
      top_k: fraction of pixels kept once ``step_percent`` reaches 1.
      step_percent: anneal knob; must be a static Python float.
    """
    B, N, H, W, K = log_probs.shape
    step_percent = min(float(step_percent), 1.0)
    flat_lp = log_probs.reshape(B * N, H * W, K)
    flat_l = labels.reshape(B * N, H * W)

    valid = flat_l != ignore_index
    safe_l = jnp.where(valid, flat_l, 0).astype(jnp.int32)
    picked = jnp.take_along_axis(flat_lp, safe_l[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, -picked, 0.0)  # torch nll reduction='none' gives 0 on ignored

    n_pixels = H * W
    n_top_k = int(step_percent * top_k * n_pixels + (1 - step_percent) * n_pixels)
    n_top_k = max(min(n_top_k, n_pixels), 1)
    top_vals, _ = jax.lax.top_k(nll, n_top_k)
    return jnp.mean(top_vals)
