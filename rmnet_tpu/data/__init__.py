"""Host-side data pipeline: IO, transforms, datasets, loader."""

from rmnet_tpu.data.io import IO, read_flo, write_flo
from rmnet_tpu.data.datasets import DatasetCollector, DatasetSubset, DataLoader

__all__ = ["IO", "read_flo", "write_flo", "DatasetCollector", "DatasetSubset", "DataLoader"]
