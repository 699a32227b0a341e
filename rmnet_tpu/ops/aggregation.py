"""Soft aggregation of per-object foreground probabilities into K-slot logits.

Static-shape replacement for the reference's ragged Python loop
(models/rmnet.py:289-302): per-object probs live in fixed K slots with a
(B, K) validity mask instead of a ragged ``(sum(n_objects), H, W)`` batch.

Semantics (exactly the reference math):
  * background slot 0 gets ``prod_k (1 - p_k)`` over *valid* object slots;
  * valid object slots keep their probability; invalid slots get 0;
  * everything is clamped to [1e-7, 1 - 1e-7] and mapped through
    ``log(p / (1 - p))``.

An invalid slot therefore lands on logit ``log(1e-7 / (1 - 1e-7)) =
-16.1181`` — which is precisely where the reference's magic constant for
suppressing non-existing objects (models/rmnet.py:442-448) comes from.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-7
# log(EPS / (1 - EPS)): the logit of a fully-suppressed slot.
SUPPRESSED_LOGIT = -16.11809565095832


def soft_aggregation(ps: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Merge per-object fg probabilities into K-channel logits.

    Args:
      ps: (B, K, H, W) per-object foreground probabilities; slot 0 is
        ignored (background is derived, not predicted).
      valid: (B, K) bool; True for real object slots (slot 0 must be False).

    Returns:
      logits: (B, K, H, W) float32.
    """
    B, K, H, W = ps.shape
    # always float32: the 1 - 1e-7 clamp is unrepresentable in bfloat16
    # (rounds to 1.0 and the logit blows up to +inf)
    ps = ps.astype(jnp.float32)
    v = valid.astype(ps.dtype)[..., None, None]  # (B, K, 1, 1)
    ps_v = ps * v

    bg = jnp.prod(jnp.where(v > 0, 1.0 - ps, 1.0), axis=1)  # (B, H, W)
    em = ps_v.at[:, 0].set(bg)

    em = jnp.clip(em, EPS, 1.0 - EPS)
    return jnp.log(em / (1.0 - em))
