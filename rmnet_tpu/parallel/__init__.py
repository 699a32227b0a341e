"""Device-mesh parallelism: data-parallel training and an eval farm.

TPU-native replacements for the reference's parallel machinery:
  * torch.nn.DataParallel (core/train.py:68-69) -> a jax.sharding.Mesh with
    the batch axis sharded; XLA inserts the gradient all-reduce over ICI.
  * SyncBatchNorm via NCCL world_size=1 (core/train.py:59-66) -> implicit:
    under GSPMD the batch mean inside BatchNorm2d is computed over the
    GLOBAL (sharded) batch, so batch-stats training is synced by
    construction (tests/test_train_bn.py asserts replica-identical stats).
  * the eval_server thread-per-GPU farm (utils/eval_server.py:78-127) ->
    DeviceFarm: per-device jitted replicas fed from host threads.
"""

from rmnet_tpu.parallel.mesh import (
    make_mesh,
    make_hybrid_mesh,
    shard_batch,
    hybrid_shard_batch,
    replicate,
    data_parallel_sharding,
    spatial_sharding,
    spatial_forward_video,
)
from rmnet_tpu.parallel.eval_farm import DeviceFarm

__all__ = [
    "make_mesh",
    "make_hybrid_mesh",
    "shard_batch",
    "hybrid_shard_batch",
    "replicate",
    "data_parallel_sharding",
    "spatial_sharding",
    "spatial_forward_video",
    "DeviceFarm",
]
