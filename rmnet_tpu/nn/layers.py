"""torch-compatible primitive layers on NHWC, as flax.linen modules.

Parameter layouts are chosen so that importing torch weights is a pure
transpose (see rmnet_tpu/models/torch_import.py):
  Conv2d.weight          HWIO  <- torch OIHW
  ConvTranspose2d.weight HWIO (spatially flipped) <- torch IOHW
  BatchNorm2d            weight/bias params; running stats in 'batch_stats'.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def kaiming_normal_conv_init(key, shape, dtype=jnp.float32):
    """torch.nn.init.kaiming_normal_ defaults on a conv weight.

    torch: std = gain / sqrt(fan_in), gain = sqrt(2) (leaky_relu, a=0),
    fan_in = in_channels * kh * kw. Shape here is HWIO.
    """
    kh, kw, cin, _ = shape
    fan_in = kh * kw * cin
    std = (2.0 / fan_in) ** 0.5
    return jax.random.normal(key, shape, dtype) * jnp.asarray(std, dtype)


def torch_default_conv_init(key, shape, dtype=jnp.float32):
    """torch Conv2d default init: kaiming_uniform_(a=sqrt(5)) == U(-b, b),
    b = 1/sqrt(fan_in). Used where the reference keeps torch defaults."""
    kh, kw, cin, _ = shape
    fan_in = kh * kw * cin
    bound = 1.0 / (fan_in**0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class Conv2d(nn.Module):
    """torch.nn.Conv2d parity on NHWC input."""

    features: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = kaiming_normal_conv_init
    dtype: Optional[jnp.dtype] = None  # compute dtype (None = input dtype)

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        weight = self.param("weight", self.kernel_init, (kh, kw, cin, self.features))
        dtype = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            weight.astype(dtype),
            window_strides=self.stride,
            padding=[(self.padding[0], self.padding[0]), (self.padding[1], self.padding[1])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(dtype)
        return y


class ConvTranspose2d(nn.Module):
    """torch.nn.ConvTranspose2d parity on NHWC input.

    Implemented as an input-dilated convolution with a spatially-flipped
    kernel: out = conv(dilate_s(x), flip(W)), padding (k-1-p) per side —
    exactly torch's geometry out = (in-1)*s - 2p + k.
    """

    features: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = kaiming_normal_conv_init
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        # Stored pre-flipped in HWIO so that import from torch IOHW is
        # weight[i, o, ::-1, ::-1].transpose(2, 3, 0, 1).
        weight = self.param("weight", self.kernel_init, (kh, kw, cin, self.features))
        dtype = self.dtype or x.dtype
        if self.kernel_size == (4, 4) and self.stride == (2, 2) and self.padding == (1, 1):
            # subpixel lowering for the common 4x4/s2/p1 deconv: input-dilated
            # convs are slow on TPU (Mosaic handles lhs_dilation poorly); the
            # same math is one stride-1 3x3 conv producing 4 phase outputs +
            # a space-interleave. Phase kernel K3[t, p] = W[2t - p] per axis.
            y = self._subpixel_2x(x.astype(dtype), weight.astype(dtype))
        else:
            pad_h = kh - 1 - self.padding[0]
            pad_w = kw - 1 - self.padding[1]
            y = jax.lax.conv_general_dilated(
                x.astype(dtype),
                weight.astype(dtype),
                window_strides=(1, 1),
                padding=[(pad_h, pad_h), (pad_w, pad_w)],
                lhs_dilation=self.stride,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(dtype)
        return y

    def _subpixel_2x(self, x, w):
        """4x4/s2/p1 transposed conv as a 3x3 conv + 2x2 phase interleave.

        1-D derivation with the stored (pre-flipped) kernel W: the dilated
        form gives out[2i + p] = sum_t K3[t, p] * x[i - 1 + t] with
        K3[t, p] = W[2t - p] (zero outside [0, 4)) — i.e. per output phase
        p a 3-tap stride-1 conv. In 2-D the four (py, px) phases share one
        3x3 conv with 4*Cout output channels, interleaved back to
        (2H, 2W, Cout). Bit-identical taps, no lhs_dilation.
        """
        B, H, W_in, cin = x.shape
        cout = w.shape[-1]
        # constant-index gather of the phase taps (W[2t - p] per axis, zero
        # outside [0, 4) via a 1-ring zero pad)
        wp = jnp.pad(w, ((1, 1), (1, 1), (0, 0), (0, 0)))  # (6, 6, cin, cout)
        t = np.arange(3)
        p = np.arange(2)
        iy = 2 * t[:, None] - p[None, :] + 1  # (3, 2) in [0, 6)
        k3 = wp[iy[:, None, :, None], iy[None, :, None, :]]  # (3,3,2,2,cin,cout)
        k3 = k3.transpose(0, 1, 4, 2, 3, 5).reshape(3, 3, cin, 4 * cout)
        y = jax.lax.conv_general_dilated(
            x, k3,
            window_strides=(1, 1),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (B, H, W, 2*2*cout)
        y = y.reshape(B, H, W_in, 2, 2, cout)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W_in, cout)
        return y


class BatchNorm2d(nn.Module):
    """torch.nn.BatchNorm2d parity on NHWC input.

    Frozen (eval) mode by default — the reference trains with both nets in
    .eval() (core/train.py:138-143), so running stats are used everywhere.
    ``use_running_average=False`` computes batch stats (the trainable path;
    requires the caller to apply with ``mutable=['batch_stats']``). Under
    pjit/GSPMD the batch axis is sharded but the program is one logical
    computation, so ``jnp.mean`` over the batch is already the GLOBAL mean —
    XLA inserts the cross-device reduction. That is SyncBatchNorm semantics
    (reference core/train.py:59-66) with no explicit pmean needed.
    """

    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        c = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "running_mean", lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "running_var", lambda: jnp.ones((c,)))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(0, 1, 2))
            var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(mean)
            if not self.is_initializing():
                n = x.shape[0] * x.shape[1] * x.shape[2]
                # torch uses the unbiased variance for the running stat
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased

        dtype = x.dtype
        inv = jax.lax.rsqrt(var.astype(jnp.float32) + self.eps).astype(dtype)
        out = (x - mean.astype(dtype)) * inv * weight.astype(dtype) + bias.astype(dtype)
        return out


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """torch MaxPool2d(kernel_size=3, stride=2, padding=1) on NHWC."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
