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
