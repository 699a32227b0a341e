"""Minimal NN layer: flax.linen modules with torch-compatible semantics.

The reference's weights (torchvision ResNet-50, reference .pth checkpoints)
must import losslessly, so convolution padding, BatchNorm eval semantics and
transposed-conv geometry replicate torch exactly:

  Conv2d        — NHWC, explicit symmetric padding, OIHW->HWIO kernels.
  ConvTranspose2d — torch geometry (stride, padding, kernel) via
                  lax.conv_transpose with matching spec.
  BatchNorm     — frozen (running stats) by default, matching the reference
                  training mode where both nets stay in eval() mode
                  (core/train.py:138-143, USE_BATCH_NORM=False). Trainable
                  batch-stats mode (USE_BATCH_NORM=True) applies with
                  mutable=['batch_stats']; under pjit/GSPMD the batch mean
                  is already global, which IS SyncBatchNorm — no explicit
                  collective needed (tests/test_train_bn.py).

Parameter naming mirrors torch (`weight`, `bias`, `running_mean`,
`running_var`) so checkpoint import is a pure tree re-shape.
"""

from rmnet_tpu.nn.layers import Conv2d, ConvTranspose2d, BatchNorm2d, max_pool_3x3_s2

__all__ = ["Conv2d", "ConvTranspose2d", "BatchNorm2d", "max_pool_3x3_s2"]
