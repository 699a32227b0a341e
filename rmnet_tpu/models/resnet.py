"""ResNet-50 trunk (through layer3) in flax, torch-checkpoint compatible.

The reference encoders wrap torchvision resnet50 through ``layer3``
(models/rmnet.py:57-64, 86-94): conv1/bn1/relu/maxpool + layer1(256, 1/4) +
layer2(512, 1/8) + layer3(1024, 1/16). torchvision's "v1.5" bottleneck places
the stride on the 3x3 conv — replicated here so pretrained weights import
losslessly (see models/torch_import.py for the OIHW->HWIO mapping).

BatchNorm runs frozen (running stats) by default, matching the reference's
eval()-mode training (core/train.py:138-143).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from rmnet_tpu.nn import BatchNorm2d, Conv2d, max_pool_3x3_s2
from rmnet_tpu.nn.layers import torch_default_conv_init


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1x1 -> 3x3(stride) -> 1x1(x4) + residual."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        p = self.planes
        init = torch_default_conv_init
        self.conv1 = Conv2d(p, (1, 1), use_bias=False, kernel_init=init, dtype=self.dtype)
        self.bn1 = BatchNorm2d()
        self.conv2 = Conv2d(
            p, (3, 3), stride=(self.stride, self.stride), padding=(1, 1),
            use_bias=False, kernel_init=init, dtype=self.dtype,
        )
        self.bn2 = BatchNorm2d()
        self.conv3 = Conv2d(p * 4, (1, 1), use_bias=False, kernel_init=init, dtype=self.dtype)
        self.bn3 = BatchNorm2d()
        if self.has_downsample:
            self.downsample_conv = Conv2d(
                p * 4, (1, 1), stride=(self.stride, self.stride),
                use_bias=False, kernel_init=init, dtype=self.dtype,
            )
            self.downsample_bn = BatchNorm2d()

    def __call__(self, x, train_bn: bool = False):
        ura = not train_bn
        out = nn.relu(self.bn1(self.conv1(x), ura))
        out = nn.relu(self.bn2(self.conv2(out), ura))
        out = self.bn3(self.conv3(out), ura)
        if self.has_downsample:
            identity = self.downsample_bn(self.downsample_conv(x), ura)
        else:
            identity = x
        return nn.relu(out + identity)


def _make_layer(planes: int, blocks: int, stride: int, dtype):
    return [
        Bottleneck(
            planes=planes,
            stride=stride if i == 0 else 1,
            has_downsample=(i == 0),
            dtype=dtype,
        )
        for i in range(blocks)
    ]


class ResNet50Trunk(nn.Module):
    """conv1..layer3 of ResNet-50; returns (r4 1/16, r3 1/8, r2 1/4, c1 1/2).

    ``extra_stem`` (optional, NHWC 64-ch at 1/2) is summed with conv1's
    output before bn1 — the memory encoder's mask/other-mask stems hook in
    here (reference models/rmnet.py:73-75).
    """

    dtype: Optional[jnp.dtype] = None

    def setup(self):
        init = torch_default_conv_init
        self.conv1 = Conv2d(
            64, (7, 7), stride=(2, 2), padding=(3, 3),
            use_bias=False, kernel_init=init, dtype=self.dtype,
        )
        self.bn1 = BatchNorm2d()
        self.layer1 = _make_layer(64, 3, 1, self.dtype)
        self.layer2 = _make_layer(128, 4, 2, self.dtype)
        self.layer3 = _make_layer(256, 6, 2, self.dtype)

    def __call__(self, x, extra_stem=None, train_bn: bool = False, conv1_out=None):
        """``conv1_out``: precomputed ``conv1(x)`` — lets the memory encoder
        run the RGB stem once per frame and broadcast it across the
        per-object batch (the mask/other stems are the only per-object part
        of the stem, reference models/rmnet.py:73-75)."""
        x = self.conv1(x) if conv1_out is None else conv1_out
        if extra_stem is not None:
            x = x + extra_stem
        c1 = nn.relu(self.bn1(x, not train_bn))  # 1/2, 64
        x = max_pool_3x3_s2(c1)  # 1/4, 64
        r2 = x
        for blk in self.layer1:
            r2 = blk(r2, train_bn)  # 1/4, 256
        r3 = r2
        for blk in self.layer2:
            r3 = blk(r3, train_bn)  # 1/8, 512
        r4 = r3
        for blk in self.layer3:
            r4 = blk(r4, train_bn)  # 1/16, 1024
        return r4, r3, r2, c1
