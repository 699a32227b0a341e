"""Fused regional memory read as a Pallas TPU kernel (flash-style, block-sparse).

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

Block sparsity (the algorithmic heart of RMNet — the reference shrinks the
attention work to flow-tracked object boxes, models/rmnet.py:243-248 +
reg_att_map_generator.cu:15-93): memory keys/values are *exactly zero*
outside each slot's regional bbox (``memorize`` multiplies them by the
0/1 att map), so any memory tile with no in-box valid position contributes
scores of exactly 0 and values of exactly 0. Such tiles are skipped
entirely — no DMA, no FLOPs — and their softmax mass is restored in closed
form: a skipped tile holds ``z`` valid zero-score positions, which add
``z * exp(0 - m)`` to the softmax denominator and nothing to the numerator.
Tile skipping works by scalar-prefetch index remapping: active tiles are
compacted to the front of the grid order and trailing inactive steps re-map
to the last active tile (Pallas skips the copy when consecutive grid steps
reference the same block).

This also makes bank-capacity padding free: slots past the cursor are
invalid, every one of their tiles is skipped, so the engine can pad all
banks to one bucketed capacity and compile the kernel ONCE per (h, w, K)
geometry instead of once per bank size.

Differentiable: a ``jax.custom_vjp`` implements the standard recompute-based
flash backward (probabilities rebuilt from the saved log-sum-exp, one extra
pass over the memory tiles) with the SAME block-sparse tile skip. Skipped
tiles need no kernel work in the backward either: on a skipped tile the
key/value are exactly zero, so every query's probability there is the
constant exp(-lse) and the tile's dK/dV reduce to one closed-form rank-1
broadcast per batch row (dV_j = sum_q exp(-lse_q) dO_q and
dK_j = -scale * sum_q exp(-lse_q) D_q q_q, identical for every valid
position j of every skipped tile), while their dQ contribution is exactly
zero (ds . K_j = 0). The result is the EXACT dense-path gradient whenever
the op's contract holds (memory k/v zero outside the boxes — guaranteed by
``memorize``), at block-sparse cost in both passes.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _kernel(order_ref, active_ref, z_ref, q_ref, k_ref, v_ref, bias_ref,
            out_ref, lse_ref, acc_ref, m_ref, l_ref, *, scale):
    n = pl.program_id(0)
    mi = pl.program_id(1)
    n_m = pl.num_programs(1)

    @pl.when(mi == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(active_ref[n, mi] == 1)
    def _():
        q = q_ref[0]        # (Qp, Ck)
        k = k_ref[0, 0]     # (MT, Ck)
        v = v_ref[0, 0]     # (MT, Cv)
        bias = bias_ref[0, 0]  # (1, MT) additive: 0 valid, -inf invalid

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
        # closed-form mass of the skipped valid zero-score positions:
        # z positions with s = 0 contribute z * exp(0 - m) to l and 0 to acc
        z = z_ref[n].astype(jnp.float32)
        m = m_ref[:]
        m2 = jnp.where(z > 0, jnp.maximum(m, 0.0), m)
        alpha = jnp.exp(m - m2)
        l_raw = l_ref[:] * alpha + z * jnp.exp(-m2)
        l = jnp.where(l_raw > 0, l_raw, 1.0)  # no valid positions -> output 0
        out_ref[0] = (acc_ref[:] * alpha / l).astype(out_ref.dtype)
        # log-sum-exp for the recompute-based backward: the final softmax
        # probability of position j is exp(s_j - lse). Rows with no valid
        # positions get +inf (=> p == 0 everywhere, zero gradients).
        lse_ref[0] = jnp.where(
            l_raw > 0, m2 + jnp.log(l), jnp.asarray(jnp.inf, jnp.float32)
        )


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _tile_metadata(slot_valid, bboxes, N, S, h, w, stride, mt):
    """Per-position validity / in-box masks + compacted tile order.

    Shared by the forward and backward passes (recomputed in the backward —
    a handful of int ops on (N, S)/(N, nt) arrays, cheaper than saving).
    """
    hw = h * w
    M = S * hw
    Mp = _round_up(M, mt)
    nt = Mp // mt

    pos_valid = jnp.repeat(slot_valid, hw, axis=1)  # (N, M)
    if bboxes is None:
        in_box = pos_valid
    else:
        # /stride sample grid of memorize's raster (ops/att_map.py::
        # _raster_small with offset (0, 0)): cell (i, j) is nonzero iff
        # y_min <= stride*i <= y_max and x_min <= stride*j <= x_max
        ys = (jnp.arange(h, dtype=jnp.int32) * stride)[:, None]  # (h, 1)
        xs = (jnp.arange(w, dtype=jnp.int32) * stride)[None, :]  # (1, w)
        x_min = bboxes[..., 0][:, :, None, None]
        x_max = bboxes[..., 1][:, :, None, None]
        y_min = bboxes[..., 2][:, :, None, None]
        y_max = bboxes[..., 3][:, :, None, None]
        cell = ((ys >= y_min) & (ys <= y_max) & (xs >= x_min) & (xs <= x_max))
        in_box = (cell.reshape(N, M) & pos_valid)

    if Mp != M:
        pos_valid = jnp.pad(pos_valid, ((0, 0), (0, Mp - M)))
        in_box = jnp.pad(in_box, ((0, 0), (0, Mp - M)))

    tile_active = jnp.any(in_box.reshape(N, nt, mt), axis=2)  # (N, nt)
    # valid positions in skipped tiles: all zero-key, score exactly 0
    z = jnp.sum(
        pos_valid.reshape(N, nt, mt).sum(axis=2) * (~tile_active), axis=1
    ).astype(jnp.int32)  # (N,)

    # compaction order: active tiles first (original order), trailing steps
    # repeat the last active tile so their DMA is elided
    idx_sorted = jnp.argsort(~tile_active, axis=1).astype(jnp.int32)
    a = tile_active.sum(axis=1).astype(jnp.int32)  # (N,)
    last_active = jnp.take_along_axis(
        idx_sorted, jnp.maximum(a - 1, 0)[:, None], axis=1
    )  # (N, 1)
    ar = jnp.arange(nt, dtype=jnp.int32)[None]
    order = jnp.where(ar < a[:, None], idx_sorted, last_active)
    active_sorted = (ar < a[:, None]).astype(jnp.int32)
    return pos_valid, tile_active, z, order, active_sorted


def _pad_reshape_inputs(m_key, m_val, q_key, mt):
    N, S, h, w, Ck = m_key.shape
    Cv = m_val.shape[-1]
    hw = h * w
    M = S * hw
    Q = hw
    Qp = _round_up(Q, 8)
    Mp = _round_up(M, mt)
    nt = Mp // mt

    mk = m_key.reshape(N, M, Ck)
    mv = m_val.reshape(N, M, Cv)
    qk = q_key.reshape(N, Q, Ck)
    if Qp != Q:
        qk = jnp.pad(qk, ((0, 0), (0, Qp - Q), (0, 0)))
    if Mp != M:
        mk = jnp.pad(mk, ((0, 0), (0, Mp - M), (0, 0)))
        mv = jnp.pad(mv, ((0, 0), (0, Mp - M), (0, 0)))
    return (mk.reshape(N, nt, mt, Ck), mv.reshape(N, nt, mt, Cv), qk,
            Q, Qp, M, Mp, nt)


def _flash_fwd_impl(m_key, m_val, q_key, slot_valid, bboxes, stride, mt,
                    interpret):
    """Returns (out (N, h, w, Cv), lse (N, Qp, 1) f32)."""
    N, S, h, w, Ck = m_key.shape
    Cv = m_val.shape[-1]
    mk, mv, qk, Q, Qp, M, Mp, nt = _pad_reshape_inputs(m_key, m_val, q_key, mt)
    pos_valid, tile_active, z, order, active_sorted = _tile_metadata(
        slot_valid, bboxes, N, S, h, w, stride, mt
    )

    # additive bias per memory position: 0 for valid slots, -inf otherwise
    bias = jnp.where(pos_valid, 0.0, _NEG_INF).astype(jnp.float32)
    bias = bias.reshape(N, nt, 1, mt)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(N, nt),
        in_specs=[
            pl.BlockSpec((1, Qp, Ck), lambda n, mi, o, act, zz: (n, 0, 0)),
            pl.BlockSpec((1, 1, mt, Ck), lambda n, mi, o, act, zz: (n, o[n, mi], 0, 0)),
            pl.BlockSpec((1, 1, mt, Cv), lambda n, mi, o, act, zz: (n, o[n, mi], 0, 0)),
            pl.BlockSpec((1, 1, 1, mt), lambda n, mi, o, act, zz: (n, o[n, mi], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, Qp, Cv), lambda n, mi, o, act, zz: (n, 0, 0)),
            pl.BlockSpec((1, Qp, 1), lambda n, mi, o, act, zz: (n, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((Qp, Cv), jnp.float32),
            pltpu.VMEM((Qp, 1), jnp.float32),
            pltpu.VMEM((Qp, 1), jnp.float32),
        ],
    )
    out, lse = pl.pallas_call(
        functools.partial(_kernel, scale=1.0 / math.sqrt(Ck)),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N, Qp, Cv), q_key.dtype),
            jax.ShapeDtypeStruct((N, Qp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(order, active_sorted, z, qk, mk, mv, bias)

    return out[:, :Q].reshape(N, h, w, Cv), lse


def _bwd_kernel(order_ref, active_ref, q_ref, k_ref, v_ref, bias_ref,
                do_ref, lse_ref, d_ref,
                dq_ref, dk_ref, dv_ref, dq_acc, *, scale):
    mi = pl.program_id(1)
    n_m = pl.num_programs(1)
    n = pl.program_id(0)

    @pl.when(mi == 0)
    def _():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    @pl.when(active_ref[n, mi] == 1)
    def _():
        q = q_ref[0]          # (Qp, Ck)
        k = k_ref[0, 0]       # (MT, Ck)
        v = v_ref[0, 0]       # (MT, Cv)
        bias = bias_ref[0, 0]  # (1, MT)
        do = do_ref[0]        # (Qp, Cv)
        lse = lse_ref[0]      # (Qp, 1) f32
        dvec = d_ref[0]       # (Qp, 1) f32 = rowsum(dO * O)

        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + bias  # (Qp, MT)
        p = jnp.exp(s - lse)  # final softmax probs, recomputed exactly

        # dV_tile = P^T dO
        dv_ref[0, 0] = jax.lax.dot_general(
            p.astype(v.dtype), do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)

        # dS = P * (dO V^T - D)
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Qp, MT)
        ds = p * (dp - dvec)  # (Qp, MT) f32

        dk_ref[0, 0] = (jax.lax.dot_general(
            ds.astype(q.dtype), q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale).astype(dk_ref.dtype)

        dq_acc[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    @pl.when(mi == n_m - 1)
    def _():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _flash_bwd_impl(m_key, m_val, q_key, slot_valid, bboxes, lse, out, g,
                    stride, mt, interpret):
    N, S, h, w, Ck = m_key.shape
    Cv = m_val.shape[-1]
    hw = h * w
    mk, mv, qk, Q, Qp, M, Mp, nt = _pad_reshape_inputs(m_key, m_val, q_key, mt)
    pos_valid, tile_active, z, order, active_sorted = _tile_metadata(
        slot_valid, bboxes, N, S, h, w, stride, mt
    )
    bias = jnp.where(pos_valid, 0.0, _NEG_INF).astype(jnp.float32)
    bias_t = bias.reshape(N, nt, 1, mt)
    scale = 1.0 / math.sqrt(Ck)

    do = g.reshape(N, Q, Cv)
    o2 = out.reshape(N, Q, Cv)
    # D = rowsum(dO * O) — the softmax-backward correction term
    dvec = jnp.sum(do.astype(jnp.float32) * o2.astype(jnp.float32),
                   axis=-1, keepdims=True)  # (N, Q, 1)
    if Qp != Q:
        do = jnp.pad(do, ((0, 0), (0, Qp - Q), (0, 0)))
        dvec = jnp.pad(dvec, ((0, 0), (0, Qp - Q), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N, nt),
        in_specs=[
            pl.BlockSpec((1, Qp, Ck), lambda n, mi, o, act: (n, 0, 0)),
            pl.BlockSpec((1, 1, mt, Ck), lambda n, mi, o, act: (n, o[n, mi], 0, 0)),
            pl.BlockSpec((1, 1, mt, Cv), lambda n, mi, o, act: (n, o[n, mi], 0, 0)),
            pl.BlockSpec((1, 1, 1, mt), lambda n, mi, o, act: (n, o[n, mi], 0, 0)),
            pl.BlockSpec((1, Qp, Cv), lambda n, mi, o, act: (n, 0, 0)),
            pl.BlockSpec((1, Qp, 1), lambda n, mi, o, act: (n, 0, 0)),
            pl.BlockSpec((1, Qp, 1), lambda n, mi, o, act: (n, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, Qp, Ck), lambda n, mi, o, act: (n, 0, 0)),
            pl.BlockSpec((1, 1, mt, Ck), lambda n, mi, o, act: (n, o[n, mi], 0, 0)),
            pl.BlockSpec((1, 1, mt, Cv), lambda n, mi, o, act: (n, o[n, mi], 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((Qp, Ck), jnp.float32)],
    )
    dq, dk_t, dv_t = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N, Qp, Ck), q_key.dtype),
            jax.ShapeDtypeStruct((N, nt, mt, Ck), m_key.dtype),
            jax.ShapeDtypeStruct((N, nt, mt, Cv), m_val.dtype),
        ],
        interpret=interpret,
    )(order, active_sorted, qk, mk, mv, bias_t, do, lse, dvec)

    # ---- closed-form gradients of the skipped tiles. Every valid position
    # of a skipped tile has k = 0, v = 0 and softmax prob exp(-lse), so
    #   dV_j = sum_q exp(-lse_q) dO_q       (one (Cv,) vector per row)
    #   dK_j = -scale sum_q exp(-lse_q) D_q q_q   (one (Ck,) vector per row)
    # and the dQ contribution is exactly zero (ds . k = 0).
    c = jnp.exp(-lse[:, :, 0]).astype(jnp.float32)  # (N, Qp); 0 if lse=+inf
    dof = do.astype(jnp.float32)
    qf = qk.astype(jnp.float32)
    dv_skip = jnp.einsum("nq,nqv->nv", c, dof)                     # (N, Cv)
    dk_skip = -scale * jnp.einsum("nq,nqc->nc", c * dvec[:, :, 0], qf)

    # merge: kernel results on active tiles; rank-1 broadcasts on skipped
    # valid positions; zero on invalid/padded positions
    act_pos = jnp.repeat(tile_active, mt, axis=1)  # (N, Mp)
    dk_full = jnp.where(
        act_pos[:, :, None], dk_t.reshape(N, Mp, Ck).astype(jnp.float32),
        jnp.where(pos_valid[:, :, None], dk_skip[:, None, :], 0.0),
    )
    dv_full = jnp.where(
        act_pos[:, :, None], dv_t.reshape(N, Mp, Cv).astype(jnp.float32),
        jnp.where(pos_valid[:, :, None], dv_skip[:, None, :], 0.0),
    )

    dmk = dk_full[:, :M].reshape(m_key.shape).astype(m_key.dtype)
    dmv = dv_full[:, :M].reshape(m_val.shape).astype(m_val.dtype)
    dqk = dq[:, :Q].reshape(q_key.shape).astype(q_key.dtype)
    return dmk, dmv, dqk


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _flash_core(m_key, m_val, q_key, slot_valid, bboxes, stride, mt,
                interpret):
    out, _ = _flash_fwd_impl(m_key, m_val, q_key, slot_valid, bboxes,
                             stride, mt, interpret)
    return out


def _flash_core_fwd(m_key, m_val, q_key, slot_valid, bboxes, stride, mt,
                    interpret):
    out, lse = _flash_fwd_impl(m_key, m_val, q_key, slot_valid, bboxes,
                               stride, mt, interpret)
    return out, (m_key, m_val, q_key, slot_valid, bboxes, lse, out)


def _zero_cot(x):
    """Zero cotangent for integer/bool primals (JAX wants float0)."""
    import numpy as np

    return np.zeros(x.shape, dtype=jax.dtypes.float0)


def _flash_core_bwd(stride, mt, interpret, res, g):
    m_key, m_val, q_key, slot_valid, bboxes, lse, out = res
    dmk, dmv, dqk = _flash_bwd_impl(
        m_key, m_val, q_key, slot_valid, bboxes, lse, out, g,
        stride, mt, interpret,
    )
    return (dmk, dmv, dqk, _zero_cot(slot_valid),
            None if bboxes is None else _zero_cot(bboxes))


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


@functools.partial(
    jax.jit, static_argnames=("stride", "mt", "interpret")
)
def flash_memory_read(
    m_key: jnp.ndarray,      # (N, S, h, w, Ck)
    m_val: jnp.ndarray,      # (N, S, h, w, Cv)
    q_key: jnp.ndarray,      # (N, h, w, Ck)
    slot_valid: jnp.ndarray, # (N, S) bool
    bboxes: Optional[jnp.ndarray] = None,  # (N, S, 4) int32 full-res
    stride: int = 16,
    mt: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused memory read -> (N, h, w, Cv) (without the q_val concat).

    ``bboxes`` are the per-slot regional boxes in full-resolution padded
    coordinates (x_min, x_max, y_min, y_max — the layout the bank stores,
    ops/att_map.py::_bboxes). When given, memory positions outside a slot's
    box are known-zero (memorize masks k/v by the /stride rasterized map)
    and whole tiles of them are skipped. Without bboxes only invalid slots
    are skipped. Differentiable (recompute-based flash backward, same
    block-sparse skip; see module docstring).
    """
    return _flash_core(m_key, m_val, q_key, slot_valid, bboxes,
                       stride, mt, interpret)


def memory_read_flash(
    m_key: jnp.ndarray,
    m_val: jnp.ndarray,
    q_key: jnp.ndarray,
    q_val: jnp.ndarray,
    slot_valid: jnp.ndarray,
    bboxes: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, None]:
    """Drop-in for models.rmnet.memory_read (affinity not returned)."""
    mem = flash_memory_read(m_key, m_val, q_key, slot_valid, bboxes=bboxes,
                            interpret=interpret)
    return jnp.concatenate([mem.astype(q_val.dtype), q_val], axis=-1), None
