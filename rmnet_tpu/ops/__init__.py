"""Pure functional compute ops (jit-friendly, static shapes).

Every op here is a pure function over jnp arrays, tested against golden
numpy/torch implementations for exact semantic parity with the reference:

  pad.pad_divide_by        <- reference utils/helpers.py:105-124
  resize.resize_bilinear   <- torch F.interpolate(mode='bilinear')
  resize.resize_nearest    <- torch F.interpolate(mode='nearest')
  warp.backward_warp       <- reference models/rmnet.py:252-278 (grid_sample)
  att_map.regional_attention_map
                           <- reference extensions/reg_att_map_generator
  aggregation.soft_aggregation
                           <- reference models/rmnet.py:289-302
  losses.{lovasz_loss,nll_loss,l1_loss,focal_loss}
                           <- reference models/{lovasz_loss,focal_loss}.py
  flow_affine.update_optical_flow
                           <- reference extensions/flow_affine_transformation
"""

from rmnet_tpu.ops.pad import pad_divide_by, unpad
from rmnet_tpu.ops.resize import resize_bilinear, resize_nearest, scale_hw
from rmnet_tpu.ops.warp import backward_warp
from rmnet_tpu.ops.att_map import regional_attention_map, regional_attention_small
from rmnet_tpu.ops.aggregation import soft_aggregation
from rmnet_tpu.ops.losses import lovasz_loss, nll_loss, l1_loss, focal_loss

__all__ = [
    "pad_divide_by",
    "unpad",
    "resize_bilinear",
    "resize_nearest",
    "scale_hw",
    "backward_warp",
    "regional_attention_map",
    "regional_attention_small",
    "soft_aggregation",
    "lovasz_loss",
    "nll_loss",
    "l1_loss",
    "focal_loss",
]
