"""Golden tests for pad / resize / warp ops vs torch reference semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from rmnet_tpu.ops import (
    pad_divide_by,
    unpad,
    resize_bilinear,
    resize_nearest,
    backward_warp,
)


def torch_pad_divide_by(in_list, d, in_size):
    """Verbatim semantics of reference utils/helpers.py:105-124 (test golden)."""
    out_list = []
    h, w = in_size
    new_h = h + d - h % d if h % d > 0 else h
    new_w = w + d - w % d if w % d > 0 else w
    lh, uh = int((new_h - h) / 2), int(new_h - h) - int((new_h - h) / 2)
    lw, uw = int((new_w - w) / 2), int(new_w - w) - int((new_w - w) / 2)
    pad_array = (int(lw), int(uw), int(lh), int(uh))
    for inp in in_list:
        out_list.append(F.pad(inp, pad_array))
    return out_list, pad_array


@pytest.mark.parametrize("hw", [(480, 910), (47, 33), (64, 64)])
def test_pad_divide_by_matches_torch(hw):
    h, w = hw
    x = np.random.RandomState(0).rand(2, h, w, 3).astype(np.float32)
    (jx,), jpads = pad_divide_by([jnp.asarray(x)], 16)
    tx_in = torch.from_numpy(x).permute(0, 3, 1, 2)
    (tx,), tpads = torch_pad_divide_by([tx_in], 16, (h, w))
    assert jpads == tpads
    np.testing.assert_allclose(np.asarray(jx), tx.permute(0, 2, 3, 1).numpy())
    # unpad round-trips
    np.testing.assert_allclose(np.asarray(unpad(jx, jpads)), x)


def test_pad_divide_by_mask_axes():
    x = np.random.RandomState(1).rand(2, 4, 47, 33).astype(np.float32)
    (jx,), pads = pad_divide_by([jnp.asarray(x)], 16, spatial_axes=(-2, -1))
    assert jx.shape == (2, 4, 48, 48)
    np.testing.assert_allclose(
        np.asarray(unpad(jx, pads, spatial_axes=(-2, -1))), x
    )


@pytest.mark.parametrize(
    "in_hw,out_hw,align",
    [
        ((30, 57), (60, 114), False),   # decoder 2x upsample
        ((120, 228), (480, 912), False),  # decoder 4x upsample
        ((480, 912), (30, 57), False),  # att-map 1/16 downsample
        ((480, 912), (240, 456), False),  # tinyflownet 0.5x
        ((37, 53), (480, 912), False),
        ((30, 57), (61, 115), True),
    ],
)
def test_resize_bilinear_matches_torch(in_hw, out_hw, align):
    x = np.random.RandomState(2).rand(2, 3, *in_hw).astype(np.float32)
    t = F.interpolate(
        torch.from_numpy(x), size=out_hw, mode="bilinear", align_corners=align
    ).numpy()
    j = resize_bilinear(
        jnp.asarray(x), out_hw, spatial_axes=(-2, -1), align_corners=align
    )
    np.testing.assert_allclose(np.asarray(j), t, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((480, 910), (240, 455)), ((13, 7), (480, 912))])
def test_resize_nearest_matches_torch(in_hw, out_hw):
    x = np.random.RandomState(3).rand(1, 2, *in_hw).astype(np.float32)
    t = F.interpolate(torch.from_numpy(x), size=out_hw, mode="nearest").numpy()
    j = resize_nearest(jnp.asarray(x), out_hw, spatial_axes=(-2, -1))
    np.testing.assert_allclose(np.asarray(j), t)


def torch_warp(img0, flow):
    """Verbatim semantics of reference models/rmnet.py:252-278 (test golden)."""
    B, C, H, W = img0.size()
    x_axis = torch.arange(0, W).view(1, -1).repeat(H, 1)
    y_axis = torch.arange(0, H).view(-1, 1).repeat(1, W)
    x_axis = x_axis.view(1, 1, H, W).repeat(B, 1, 1, 1)
    y_axis = y_axis.view(1, 1, H, W).repeat(B, 1, 1, 1)
    grid = torch.cat((x_axis, y_axis), 1).float()
    vgrid = grid + flow
    vgrid[:, 0, :, :] = 2.0 * vgrid[:, 0, :, :].clone() / max(W - 1, 1) - 1.0
    vgrid[:, 1, :, :] = 2.0 * vgrid[:, 1, :, :].clone() / max(H - 1, 1) - 1.0
    vgrid = vgrid.permute(0, 2, 3, 1)
    img1 = F.grid_sample(img0.clone(), vgrid, align_corners=True)
    mask = torch.ones(img0.size())
    mask = F.grid_sample(mask, vgrid, align_corners=True)
    mask[mask < 0.9999] = 0
    mask[mask > 0] = 1
    return img1 * mask, mask


def test_backward_warp_matches_torch():
    rs = np.random.RandomState(4)
    img = rs.rand(2, 5, 31, 47).astype(np.float32)
    flow = (rs.rand(2, 2, 31, 47).astype(np.float32) - 0.5) * 20

    t_img, t_mask = torch_warp(torch.from_numpy(img), torch.from_numpy(flow))
    j_img, j_mask = backward_warp(
        jnp.asarray(img.transpose(0, 2, 3, 1)),
        jnp.asarray(flow.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(j_mask), t_mask.permute(0, 2, 3, 1).numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(j_img), t_img.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-5
    )


def test_backward_warp_zero_flow_identity():
    rs = np.random.RandomState(5)
    img = jnp.asarray(rs.rand(1, 16, 16, 3).astype(np.float32))
    flow = jnp.zeros((1, 16, 16, 2), jnp.float32)
    warped, mask = backward_warp(img, flow)
    np.testing.assert_allclose(np.asarray(warped), np.asarray(img), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mask), 1.0)


def test_backward_warp_fuzz_vs_torch():
    """Warp parity across random shapes and flow magnitudes, including
    large flows that push most samples out of bounds (validity-mask edge
    cases beyond the single-config test)."""
    rs = np.random.RandomState(6)
    for trial in range(5):
        B = int(rs.randint(1, 3))
        C = int(rs.randint(1, 5))
        H = int(rs.randint(4, 40))
        W = int(rs.randint(4, 40))
        mag = float(rs.choice([1.0, 10.0, 3.0 * max(H, W)]))
        img = rs.rand(B, C, H, W).astype(np.float32)
        flow = ((rs.rand(B, 2, H, W) - 0.5) * mag).astype(np.float32)
        t_img, t_mask = torch_warp(torch.from_numpy(img), torch.from_numpy(flow))
        j_img, j_mask = backward_warp(
            jnp.asarray(img.transpose(0, 2, 3, 1)),
            jnp.asarray(flow.transpose(0, 2, 3, 1)),
        )
        np.testing.assert_allclose(
            np.asarray(j_mask), t_mask.permute(0, 2, 3, 1).numpy(), atol=1e-6,
            err_msg=f"trial={trial} B={B} C={C} H={H} W={W} mag={mag}",
        )
        np.testing.assert_allclose(
            np.asarray(j_img), t_img.permute(0, 2, 3, 1).numpy(),
            rtol=1e-4, atol=1e-5,
            err_msg=f"trial={trial} B={B} C={C} H={H} W={W} mag={mag}",
        )
