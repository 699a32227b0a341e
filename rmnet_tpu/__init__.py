"""rmnet_tpu — a TPU-native (JAX/XLA/Pallas) video object segmentation framework.

A ground-up rebuild of the capabilities of the RMNet reference
(CVPR 2021 "Efficient Regional Memory Network for Video Object Segmentation"):
semi-supervised VOS with a space-time memory network whose memory read is
*regional* — attention is restricted to flow-tracked object bounding boxes.

Design (TPU-first, not a port):
  * static object axis (K_max slots + validity masks) instead of ragged
    per-object Python batching,
  * fixed-capacity memory bank carried through ``jax.lax.scan`` /
    a jitted streaming step instead of ``torch.cat``-growing banks,
  * regional attention as masked XLA einsum (Pallas fused kernel for the
    hot path), bboxes via masked min/max reductions instead of CUDA atomics,
  * data parallel scaling via ``jax.sharding.Mesh`` + collectives instead of
    ``torch.nn.DataParallel``.

Subpackages
-----------
ops       Pure functional compute ops (pad/resize/warp/att-map/losses/...).
nn        Minimal neural-net module layer (flax.linen with torch-compatible
          convolution/batch-norm semantics for checkpoint parity).
models    RMNet + TinyFlowNet model definitions and torch weight import.
parallel  Device-mesh utilities, sharded train/eval steps, eval farm.
data      Datasets, transforms and IO (DAVIS / YouTube-VOS / image pretrain).
utils     DAVIS J&F metrics, meters, summaries, checkpointing.
core      Train / test / inference orchestration loops.
"""

__version__ = "0.1.0"
