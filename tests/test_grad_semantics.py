"""Training-gradient invariants of the regional attention path.

The att-map op backpropagates constant ones to its input mask. When the
mask is a softmax over K channels and EVERY channel goes through the op,
the constant component cancels exactly (sum_k dp_k/dlogit_j = 0), leaving
only warp-boundary effects. Dropping any channel from the warp breaks the
cancellation and injects a training bias — this test pins the invariant
(see the get_att_map docstring and the round-1 overfit regression)."""

import numpy as np

import jax
import jax.numpy as jnp

from rmnet_tpu.models.rmnet import RMNet, RMNetApply


def test_att_map_gradient_cancels_through_softmax():
    K, H, W = 3, 24, 32
    apply = RMNetApply(RMNet(), memorize_every=1)
    rs = np.random.RandomState(0)
    logits = jnp.asarray(rs.randn(1, K, H, W).astype(np.float32))
    # small in-bounds flow: every interior source pixel receives identical
    # total adjoint weight per channel
    flow = jnp.asarray((rs.rand(1, H, W, 2).astype(np.float32) - 0.5) * 2.0)

    def f(lg):
        probs = jax.nn.softmax(lg, axis=1)
        att, _ = apply.get_att_map(probs, flow)
        return jnp.sum(att)

    grad = np.asarray(jax.grad(f)(logits))
    # interior pixels (away from warp borders): exact cancellation
    interior = grad[:, :, 4:-4, 4:-4]
    assert np.abs(interior).max() < 1e-4, np.abs(interior).max()
    # sanity: the pre-softmax path does receive the constant-ones adjoint
    def g(lg):
        att, _ = apply.get_att_map(lg, flow)  # no softmax -> no cancellation
        return jnp.sum(att)

    grad_raw = np.asarray(jax.grad(g)(logits))
    assert np.abs(grad_raw[:, :, 4:-4, 4:-4]).mean() > 0.5


def test_fused_warp_att_matches_unfused_value_and_grad():
    """warped_regional_attention_small (round-3 train-perf custom VJP: one
    single-channel splat instead of autodiff's K-channel tap scatter) must
    equal the unfused warp -> regional_attention_small chain in BOTH value
    and gradient — the fusion is an exact rewrite, not an approximation."""
    from rmnet_tpu.ops.att_map import (
        regional_attention_small,
        warped_regional_attention_small,
    )
    from rmnet_tpu.ops.warp import backward_warp

    K, H, W = 4, 32, 48
    rs = np.random.RandomState(2)
    mask = jnp.asarray(rs.rand(2, K, H, W).astype(np.float32))
    flow = jnp.asarray((rs.rand(2, H, W, 2).astype(np.float32) - 0.5) * 6.0)
    out_hw, offset = (H // 8, W // 8), (0, 0)

    def unfused(m):
        warped, _ = backward_warp(m.transpose(0, 2, 3, 1), flow)
        att, _ = regional_attention_small(
            warped.transpose(0, 3, 1, 2), out_hw, offset, 8, 0.5, 10, 4
        )
        return att

    def fused(m):
        return warped_regional_attention_small(
            m, flow, out_hw, offset, 8, 0.5, 10, 4
        )

    np.testing.assert_array_equal(np.asarray(fused(mask)),
                                  np.asarray(unfused(mask)))
    # weighted-sum cotangent: the att op's straight-through grad ignores the
    # upstream cotangent, so both paths must produce the same mask gradient
    w = jnp.asarray(rs.rand(2, K, H // 8, W // 8).astype(np.float32))
    g_un = jax.grad(lambda m: jnp.sum(unfused(m) * w))(mask)
    g_fu = jax.grad(lambda m: jnp.sum(fused(m) * w))(mask)
    np.testing.assert_allclose(np.asarray(g_fu), np.asarray(g_un),
                               rtol=1e-5, atol=1e-6)
    # the gradient is channel-uniform (the invariant the fusion exploits)
    g = np.asarray(g_fu)
    np.testing.assert_allclose(g, np.broadcast_to(g[:, :1], g.shape),
                               rtol=0, atol=1e-6)


def test_att_small_gradient_cancels_on_training_path():
    """The invariant must hold on the path training ACTUALLY uses —
    get_att_small with skip_bg_warp=False (RMNetApply.step). A training
    apply accidentally built with the inference flags would warp only K-1
    channels and break the cancellation; pin the real branch."""
    K, H, W = 3, 24, 32
    apply = RMNetApply(RMNet(), memorize_every=1)  # training defaults
    assert not apply.skip_bg_warp and not apply.warp_u8
    rs = np.random.RandomState(1)
    logits = jnp.asarray(rs.randn(1, K, H, W).astype(np.float32))
    flow = jnp.asarray((rs.rand(1, H, W, 2).astype(np.float32) - 0.5) * 2.0)

    def f(lg):
        probs = jax.nn.softmax(lg, axis=1)
        att = apply.get_att_small(probs, flow, (H // 8, W // 8), (0, 0))
        return jnp.sum(att)

    grad = np.asarray(jax.grad(f)(logits))
    interior = grad[:, :, 4:-4, 4:-4]
    assert np.abs(interior).max() < 1e-4, np.abs(interior).max()


def test_backward_warp_bf16_gradient_is_nonzero():
    """Regression: the packed bf16 sampler routes through bitcasts whose
    cotangent is ZERO — backward_warp must never auto-select it. bf16
    training (TRAIN.BF16) backprops through the warp into prev_mask."""
    from rmnet_tpu.ops import backward_warp

    rs = np.random.RandomState(2)
    img = jnp.asarray(rs.rand(1, 16, 20, 2).astype(np.float32)).astype(jnp.bfloat16)
    flow = jnp.zeros((1, 16, 20, 2), jnp.bfloat16)

    def f(im):
        warped, _ = backward_warp(im, flow)
        return jnp.sum(warped.astype(jnp.float32))

    g = np.asarray(jax.grad(f)(img), np.float32)
    assert np.abs(g).sum() > 100.0  # identity warp: grad == ones-ish
