"""TinyFlowNet: FlowNetS-style coarse-to-fine optical flow CNN.

Capability parity with reference models/tiny_flownet.py:17-133. The
per-frame-pair Python loop of the reference ``forward``
(models/tiny_flownet.py:129-130) becomes a time-shifted vmap: all T-1 pairs
run as one batched conv stack — much better MXU utilization than T-1 small
launches.

Geometry: inputs are padded to /64 and halved (bilinear, align_corners=False)
before the conv stack; ``flow2`` is predicted at 1/8 of the padded size,
upsampled x8 and un-padded (models/tiny_flownet.py:84-119).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from rmnet_tpu.nn import Conv2d, ConvTranspose2d
from rmnet_tpu.nn.layers import kaiming_normal_conv_init
from rmnet_tpu.ops import pad_divide_by, resize_bilinear, scale_hw, unpad


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=0.1)


class TinyFlowNet(nn.Module):
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        k = kaiming_normal_conv_init
        d = self.dtype
        self.conv1 = Conv2d(64, (7, 7), stride=(2, 2), padding=(3, 3), kernel_init=k, dtype=d)
        self.conv2 = Conv2d(128, (5, 5), stride=(2, 2), padding=(2, 2), kernel_init=k, dtype=d)
        self.conv3 = Conv2d(256, (5, 5), stride=(2, 2), padding=(2, 2), kernel_init=k, dtype=d)
        self.conv3_1 = Conv2d(256, (3, 3), padding=(1, 1), kernel_init=k, dtype=d)
        self.conv4 = Conv2d(512, (3, 3), stride=(2, 2), padding=(1, 1), kernel_init=k, dtype=d)
        self.conv4_1 = Conv2d(512, (3, 3), padding=(1, 1), kernel_init=k, dtype=d)
        self.conv5 = Conv2d(512, (3, 3), stride=(2, 2), padding=(1, 1), kernel_init=k, dtype=d)
        self.conv5_1 = Conv2d(512, (3, 3), padding=(1, 1), kernel_init=k, dtype=d)

        self.deconv4 = ConvTranspose2d(256, (4, 4), stride=(2, 2), padding=(1, 1),
                                       kernel_init=k, dtype=d)
        self.deconv3 = ConvTranspose2d(128, (4, 4), stride=(2, 2), padding=(1, 1),
                                       kernel_init=k, dtype=d)
        self.deconv2 = ConvTranspose2d(64, (4, 4), stride=(2, 2), padding=(1, 1),
                                       kernel_init=k, dtype=d)

        self.predict_flow5 = Conv2d(2, (3, 3), padding=(1, 1), kernel_init=k, dtype=d)
        self.predict_flow4 = Conv2d(2, (3, 3), padding=(1, 1), kernel_init=k, dtype=d)
        self.predict_flow3 = Conv2d(2, (3, 3), padding=(1, 1), kernel_init=k, dtype=d)
        self.predict_flow2 = Conv2d(2, (3, 3), padding=(1, 1), kernel_init=k, dtype=d)

        self.upsampled_flow5_to_4 = ConvTranspose2d(
            2, (4, 4), stride=(2, 2), padding=(1, 1), use_bias=False, kernel_init=k, dtype=d)
        self.upsampled_flow4_to_3 = ConvTranspose2d(
            2, (4, 4), stride=(2, 2), padding=(1, 1), use_bias=False, kernel_init=k, dtype=d)
        self.upsampled_flow3_to_2 = ConvTranspose2d(
            2, (4, 4), stride=(2, 2), padding=(1, 1), use_bias=False, kernel_init=k, dtype=d)

    def pair_forward(self, img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
        """Flow img0 -> img1 for one frame pair; NHWC (B, H, W, 3) each."""
        H, W = img0.shape[1:3]
        (img0, img1), pads = pad_divide_by([img0, img1], 64)
        Hp, Wp = img0.shape[1:3]
        half = scale_hw(Hp, Wp, 0.5)
        img0 = resize_bilinear(img0, half, align_corners=False)
        img1 = resize_bilinear(img1, half, align_corners=False)

        out_conv2 = self.conv2(_leaky(self.conv1(jnp.concatenate([img0, img1], axis=-1))))
        out_conv2 = _leaky(out_conv2)
        out_conv3 = _leaky(self.conv3_1(_leaky(self.conv3(out_conv2))))
        out_conv4 = _leaky(self.conv4_1(_leaky(self.conv4(out_conv3))))
        out_conv5 = _leaky(self.conv5_1(_leaky(self.conv5(out_conv4))))

        flow5 = self.predict_flow5(out_conv5)
        flow5_up = self.upsampled_flow5_to_4(flow5)
        out_deconv4 = _leaky(self.deconv4(out_conv5))

        concat4 = jnp.concatenate([out_conv4, out_deconv4, flow5_up], axis=-1)
        flow4 = self.predict_flow4(concat4)
        flow4_up = self.upsampled_flow4_to_3(flow4)
        out_deconv3 = _leaky(self.deconv3(concat4))

        concat3 = jnp.concatenate([out_conv3, out_deconv3, flow4_up], axis=-1)
        flow3 = self.predict_flow3(concat3)
        flow3_up = self.upsampled_flow3_to_2(flow3)
        out_deconv2 = _leaky(self.deconv2(concat3))

        concat2 = jnp.concatenate([out_conv2, out_deconv2, flow3_up], axis=-1)
        flow2 = self.predict_flow2(concat2)
        flow2 = resize_bilinear(flow2, (Hp, Wp), align_corners=False)
        return unpad(flow2, pads)

    def __call__(self, frames: jnp.ndarray) -> jnp.ndarray:
        """Per-video forward: frames (B, T, H, W, 3) -> flows (B, T, H, W, 2).

        flow[t] is the backward flow frame_t -> frame_{t-1}; flow[0] = 0
        (reference models/tiny_flownet.py:121-132). All T-1 pairs are folded
        into the batch axis for one conv-stack pass.
        """
        B, T, H, W, C = frames.shape
        if T == 1:
            return jnp.zeros((B, T, H, W, 2), frames.dtype)
        curr = frames[:, 1:].reshape(B * (T - 1), H, W, C)
        prev = frames[:, :-1].reshape(B * (T - 1), H, W, C)
        flows = self.pair_forward(curr, prev)  # (B*(T-1), H, W, 2)
        flows = flows.reshape(B, T - 1, H, W, 2)
        zero = jnp.zeros((B, 1, H, W, 2), flows.dtype)
        return jnp.concatenate([zero, flows], axis=1)
