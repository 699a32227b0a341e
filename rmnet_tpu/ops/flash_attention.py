"""Fused regional memory read as a Pallas TPU kernel (flash-style).

The STM memory read (reference MemoryReader, models/rmnet.py:143-165)
computes ``softmax_over_M(K_mem @ q / sqrt(Ck)) . V_mem`` where
M = slots x h x w can reach tens of thousands of positions. The XLA
fallback (rmnet_tpu/models/rmnet.py::memory_read) materializes the
(N, M, Q) affinity in HBM; this kernel streams memory tiles through VMEM
with an online softmax — O(M) HBM traffic instead of O(M*Q) — and applies
the slot-validity mask as an additive -inf bias, preserving the exact
fixed-capacity-bank semantics (invalid slots contribute zero probability;
valid-but-regionally-masked positions keep score 0 and take softmax mass,
as the reference intends).

Forward-only: training uses the XLA path (differentiable); the engine flips
``RMNetApply.use_flash_attention`` on for inference.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, acc_ref, m_ref, l_ref, *, scale):
    mi = pl.program_id(1)
    n_m = pl.num_programs(1)

    @pl.when(mi == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]  # (Qp, Ck)
    k = k_ref[0]  # (MT, Ck)
    v = v_ref[0]  # (MT, Cv)
    bias = bias_ref[0]  # (1, MT) additive: 0 valid, -inf invalid

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (Qp, MT)
    s = s + bias  # broadcast over rows

    m_prev = m_ref[:]  # (Qp, 1)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)  # (Qp, MT)

    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = m_new

    @pl.when(mi == n_m - 1)
    def _():
        out_ref[0] = (acc_ref[:] / l_ref[:]).astype(out_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("mt", "interpret"))
def flash_memory_read(
    m_key: jnp.ndarray,      # (N, S, h, w, Ck)
    m_val: jnp.ndarray,      # (N, S, h, w, Cv)
    q_key: jnp.ndarray,      # (N, h, w, Ck)
    slot_valid: jnp.ndarray, # (N, S) bool
    mt: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused memory read -> (N, h, w, Cv) (without the q_val concat)."""
    N, S, h, w, Ck = m_key.shape
    Cv = m_val.shape[-1]
    hw = h * w
    M = S * hw
    Q = hw

    Qp = _round_up(Q, 8)
    Mp = _round_up(M, mt)

    mk = m_key.reshape(N, M, Ck)
    mv = m_val.reshape(N, M, Cv)
    qk = q_key.reshape(N, Q, Ck)
    if Qp != Q:
        qk = jnp.pad(qk, ((0, 0), (0, Qp - Q), (0, 0)))
    if Mp != M:
        mk = jnp.pad(mk, ((0, 0), (0, Mp - M), (0, 0)))
        mv = jnp.pad(mv, ((0, 0), (0, Mp - M), (0, 0)))

    # additive bias per memory position: 0 for valid slots, -inf otherwise
    pos_valid = jnp.repeat(slot_valid, hw, axis=1)  # (N, M)
    if Mp != M:
        pos_valid = jnp.pad(pos_valid, ((0, 0), (0, Mp - M)))
    bias = jnp.where(pos_valid, 0.0, _NEG_INF).astype(jnp.float32)[:, None, :]  # (N, 1, Mp)

    grid = (N, Mp // mt)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=1.0 / math.sqrt(Ck)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Qp, Ck), lambda n, mi: (n, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mt, Ck), lambda n, mi: (n, mi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mt, Cv), lambda n, mi: (n, mi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, mt), lambda n, mi: (n, 0, mi), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Qp, Cv), lambda n, mi: (n, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, Qp, Cv), q_key.dtype),
        scratch_shapes=[
            pltpu.VMEM((Qp, Cv), jnp.float32),
            pltpu.VMEM((Qp, 1), jnp.float32),
            pltpu.VMEM((Qp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qk, mk, mv, bias)

    return out[:, :Q].reshape(N, h, w, Cv)


def memory_read_flash(
    m_key: jnp.ndarray,
    m_val: jnp.ndarray,
    q_key: jnp.ndarray,
    q_val: jnp.ndarray,
    slot_valid: jnp.ndarray,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, None]:
    """Drop-in for models.rmnet.memory_read (affinity not returned)."""
    mem = flash_memory_read(m_key, m_val, q_key, slot_valid, interpret=interpret)
    return jnp.concatenate([mem.astype(q_val.dtype), q_val], axis=-1), None
