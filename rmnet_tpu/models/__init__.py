"""Model zoo: RMNet (regional space-time-memory VOS) and TinyFlowNet."""

from rmnet_tpu.models.rmnet import RMNet, RMNetApply
from rmnet_tpu.models.tiny_flownet import TinyFlowNet

__all__ = ["RMNet", "RMNetApply", "TinyFlowNet"]
