"""Equivalence tests for the round-2 hot-loop fusions.

Each fusion must be value-identical to the reference-semantics chain it
replaces (the golden tests pin that chain against torch):

  * regional_attention_small == nearest-/16(pad(regional_attention_map))
  * get_att_small            == nearest-/16(pad(get_att_map)) incl. warp
  * packed bf16 warp          == generic 4-gather warp on bf16 inputs
  * decoder skips/from_skips  == monolithic Decoder.__call__
  * shared-stem memory encode == per-object memory encode
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rmnet_tpu.ops import (
    backward_warp,
    pad_divide_by,
    regional_attention_map,
    regional_attention_small,
    resize_nearest,
)
from rmnet_tpu.ops.pad import divide_pads


def _random_masks(rs, B, K, H, W):
    """Masks hitting every bbox branch: dense blob, sparse (<10 px), empty."""
    m = np.zeros((B, K, H, W), np.float32)
    for b in range(B):
        for k in range(1, K):
            kind = (b + k) % 3
            if kind == 0:  # dense blob
                y, x = rs.randint(0, H - 8), rs.randint(0, W - 8)
                m[b, k, y : y + 8, x : x + 8] = rs.rand(8, 8) * 0.5 + 0.5
            elif kind == 1:  # sparse: < 10 hits -> whole-frame fallback
                for _ in range(4):
                    m[b, k, rs.randint(H), rs.randint(W)] = 0.9
            # kind == 2: empty channel
    m[:, 0] = rs.rand(B, K, H, W)[:, 0]  # bg channel: arbitrary values
    return m


def _reference_small(mask, out_hw, pads):
    """The chain regional_attention_small replaces."""
    att, boxes = regional_attention_map(jnp.asarray(mask))
    (att_p,), _ = pad_divide_by([att], 16, spatial_axes=(-2, -1))
    return resize_nearest(att_p, out_hw, spatial_axes=(-2, -1)), boxes


def test_small_att_matches_full_chain_unpadded():
    rs = np.random.RandomState(0)
    mask = _random_masks(rs, 2, 4, 64, 96)  # already /16-divisible: offset 0
    att_s, boxes_s = regional_attention_small(jnp.asarray(mask), (4, 6), (0, 0))
    att_ref, boxes_ref = _reference_small(mask, (4, 6), (0, 0, 0, 0))
    np.testing.assert_array_equal(np.asarray(att_s), np.asarray(att_ref))
    np.testing.assert_array_equal(np.asarray(boxes_s), np.asarray(boxes_ref))


def test_small_att_matches_full_chain_padded():
    rs = np.random.RandomState(1)
    H, W = 57, 83  # awkward sizes -> nontrivial symmetric padding
    mask = _random_masks(rs, 2, 3, H, W)
    lw, uw, lh, uh = divide_pads(H, W, 16)
    out_hw = ((H + lh + uh) // 16, (W + lw + uw) // 16)
    att_s, _ = regional_attention_small(jnp.asarray(mask), out_hw, (lh, lw))
    att_ref, _ = _reference_small(mask, out_hw, None)
    np.testing.assert_array_equal(np.asarray(att_s), np.asarray(att_ref))


def test_small_att_straight_through_gradient_is_ones():
    rs = np.random.RandomState(2)
    mask = jnp.asarray(_random_masks(rs, 1, 3, 32, 32))
    cot = jnp.asarray(rs.rand(1, 3, 2, 2).astype(np.float32))

    def f(m):
        att, _ = regional_attention_small(m, (2, 2), (0, 0))
        return jnp.sum(att * cot)

    g = jax.grad(f)(mask)
    np.testing.assert_array_equal(np.asarray(g), np.ones_like(np.asarray(mask)))


def test_get_att_small_matches_get_att_map_chain():
    from rmnet_tpu.models.rmnet import RMNet, RMNetApply

    rs = np.random.RandomState(3)
    B, K, H, W = 1, 3, 41, 67
    prev = rs.rand(B, K, H, W).astype(np.float32)
    prev /= prev.sum(1, keepdims=True)  # softmax-like masses
    flow = (rs.rand(B, H, W, 2).astype(np.float32) - 0.5) * 9.0

    lw, uw, lh, uh = divide_pads(H, W, 16)
    out_hw = ((H + lh + uh) // 16, (W + lw + uw) // 16)

    for skip_bg in (False, True):
        apply = RMNetApply(RMNet(), skip_bg_warp=skip_bg)
        att_s = apply.get_att_small(jnp.asarray(prev), jnp.asarray(flow), out_hw, (lh, lw))
        att_full, _ = apply.get_att_map(jnp.asarray(prev), jnp.asarray(flow))
        (att_p,), _ = pad_divide_by([att_full], 16, spatial_axes=(-2, -1))
        att_ref = resize_nearest(att_p, out_hw, spatial_axes=(-2, -1))
        np.testing.assert_array_equal(np.asarray(att_s), np.asarray(att_ref))


def test_packed_bf16_warp_matches_generic():
    from rmnet_tpu.ops.warp import grid_sample_bilinear, _grid_sample_packed_bf16

    rs = np.random.RandomState(4)
    B, H, W, C = 2, 37, 53, 3
    img = jnp.asarray(rs.rand(B, H, W, C).astype(np.float32)).astype(jnp.bfloat16)
    # coords spanning in-frame, boundary, and out-of-frame regions
    x = jnp.asarray((rs.rand(B, H, W).astype(np.float32) * (W + 20)) - 10.0)
    y = jnp.asarray((rs.rand(B, H, W).astype(np.float32) * (H + 20)) - 10.0)

    packed = _grid_sample_packed_bf16(img, x, y)
    # generic path with identical f32-weight accumulation semantics
    generic = grid_sample_bilinear(img.astype(jnp.float32), x, y).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(packed, np.float32), np.asarray(generic, np.float32),
        rtol=0, atol=2 ** -7,  # one bf16 ulp of slack for rounding-point diffs
    )
    # exact integer-coordinate sampling: identity warp reproduces the image
    xs = jnp.broadcast_to(jnp.arange(W, dtype=jnp.float32), (B, H, W))
    ys = jnp.broadcast_to(jnp.arange(H, dtype=jnp.float32)[:, None], (B, H, W))
    ident = _grid_sample_packed_bf16(img, xs, ys)
    np.testing.assert_array_equal(
        np.asarray(ident, np.float32), np.asarray(img, np.float32)
    )


def test_packed_u8_warp_close_to_exact():
    """1-gather u8-packed warp: within quantization error of the exact
    sampler, and bit-exact at integer coordinates on u8-representable
    values."""
    from rmnet_tpu.ops.warp import backward_warp_quantized

    rs = np.random.RandomState(8)
    B, H, W, C = 2, 37, 53, 2
    img = rs.rand(B, H, W, C).astype(np.float32)
    flow = ((rs.rand(B, H, W, 2) - 0.5) * 9).astype(np.float32)
    exact, m_exact = backward_warp(jnp.asarray(img), jnp.asarray(flow))
    quant, m_quant = backward_warp_quantized(jnp.asarray(img), jnp.asarray(flow))
    np.testing.assert_array_equal(np.asarray(m_quant), np.asarray(m_exact))
    np.testing.assert_allclose(
        np.asarray(quant), np.asarray(exact), rtol=0, atol=1.01 / 510
    )
    # identity warp on u8-grid values reproduces the image exactly
    img_u8 = np.round(img * 255) / 255
    ident, _ = backward_warp_quantized(
        jnp.asarray(img_u8.astype(np.float32)), jnp.zeros((B, H, W, 2), jnp.float32)
    )
    np.testing.assert_allclose(np.asarray(ident), img_u8, rtol=0, atol=1e-6)


def test_backward_warp_bf16_close_to_f32():
    rs = np.random.RandomState(5)
    B, H, W, C = 1, 48, 80, 2
    img32 = rs.rand(B, H, W, C).astype(np.float32)
    # bf16-representable flow so both paths sample identical coordinates
    flow = np.asarray(
        jnp.asarray(((rs.rand(B, H, W, 2) - 0.5) * 7).astype(np.float32))
        .astype(jnp.bfloat16), np.float32,
    )
    w32, m32 = backward_warp(jnp.asarray(img32), jnp.asarray(flow))
    wbf, mbf = backward_warp(
        jnp.asarray(img32).astype(jnp.bfloat16), jnp.asarray(flow).astype(jnp.bfloat16)
    )
    np.testing.assert_array_equal(np.asarray(mbf, np.float32), np.asarray(m32))
    np.testing.assert_allclose(
        np.asarray(wbf, np.float32), np.asarray(w32), rtol=0, atol=0.02
    )


def test_decoder_skip_split_matches_monolithic():
    from rmnet_tpu.models.rmnet import Decoder

    rs = np.random.RandomState(6)
    dec = Decoder(mdim=32)
    r4 = jnp.asarray(rs.rand(2, 4, 6, 64).astype(np.float32))
    r3 = jnp.asarray(rs.rand(2, 8, 12, 24).astype(np.float32))
    r2 = jnp.asarray(rs.rand(2, 16, 24, 16).astype(np.float32))
    vars_ = dec.init(jax.random.PRNGKey(0), r4, r3, r2)
    whole = dec.apply(vars_, r4, r3, r2)
    s3, s2 = dec.apply(vars_, r3, r2, method="skips")
    split = dec.apply(vars_, r4, s3, s2, method="from_skips")
    np.testing.assert_array_equal(np.asarray(whole), np.asarray(split))


def test_shared_stem_memory_encode_matches_per_object():
    from rmnet_tpu.models.rmnet import RMNet

    rs = np.random.RandomState(7)
    B, Ko, H, W = 1, 2, 32, 48
    model = RMNet()
    f = jnp.asarray(rs.rand(B, H, W, 3).astype(np.float32))
    m = jnp.asarray(rs.rand(B * Ko, H, W).astype(np.float32))
    o = jnp.asarray(rs.rand(B * Ko, H, W).astype(np.float32))
    vars_ = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
        jnp.zeros((1, 32, 32)), jnp.zeros((1, 32, 32)),
    )
    f_bk = jnp.broadcast_to(f[:, None], (B, Ko) + f.shape[1:]).reshape(
        (B * Ko,) + f.shape[1:]
    )
    k_ref, v_ref = model.apply(vars_, f_bk, m, o, method="encode_memory")
    k_sh, v_sh = model.apply(vars_, f, m, o, method="encode_memory_shared")
    np.testing.assert_allclose(np.asarray(k_sh), np.asarray(k_ref), rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_sh), np.asarray(v_ref), rtol=0, atol=1e-5)


def test_warp_u8_honored_without_skip_bg():
    """warp_u8=True must route through the 1-gather u8 sampler even when
    skip_bg_warp=False (override configs): output equals the
    warp_u8+skip_bg path exactly — slot 0 never reaches the bbox op either
    way — and uses the quantized (not exact) sampler."""
    from rmnet_tpu.models.rmnet import RMNet, RMNetApply

    rs = np.random.RandomState(7)
    B, K, H, W = 1, 3, 41, 67
    prev = rs.rand(B, K, H, W).astype(np.float32)
    prev /= prev.sum(1, keepdims=True)
    flow = (rs.rand(B, H, W, 2).astype(np.float32) - 0.5) * 9.0

    lw, uw, lh, uh = divide_pads(H, W, 16)
    out_hw = ((H + lh + uh) // 16, (W + lw + uw) // 16)

    u8_noskip = RMNetApply(RMNet(), warp_u8=True, skip_bg_warp=False)
    u8_skip = RMNetApply(RMNet(), warp_u8=True, skip_bg_warp=True)
    a = np.asarray(u8_noskip.get_att_small(
        jnp.asarray(prev), jnp.asarray(flow), out_hw, (lh, lw)))
    b = np.asarray(u8_skip.get_att_small(
        jnp.asarray(prev), jnp.asarray(flow), out_hw, (lh, lw)))
    np.testing.assert_array_equal(a, b)
