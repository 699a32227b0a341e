"""Thread-local RNG streams for the data pipeline.

The reference pipeline draws augmentation parameters from the process-global
``random`` / ``np.random`` (utils/data_transforms.py), which is reproducible
only because torch's DataLoader gives each worker *process* its own seeded
globals. Our workers are threads sharing one process, so global draws would
interleave nondeterministically under scheduling. Instead every draw in
datasets/transforms goes through ``pyrand()`` / ``nprand()``:

* by default they return the global modules (identical behavior to the
  reference for direct, single-threaded use);
* ``DataLoader`` calls ``seed_stream(seed)`` in the decoding thread before
  each batch, giving that batch a dedicated, deterministically-seeded pair
  of RNGs — the decoded data depends only on (loader seed, epoch, batch
  index), not on worker count or thread scheduling.
"""

import random
import threading

import numpy as np

_TLS = threading.local()


def seed_stream(seed: int) -> None:
    """Give the calling thread dedicated RNGs seeded with ``seed``."""
    _TLS.py = random.Random(seed)
    _TLS.np = np.random.RandomState(int(seed) % (2**32))


def clear_stream() -> None:
    """Revert the calling thread to the process-global RNGs."""
    _TLS.py = None
    _TLS.np = None


def pyrand():
    """This thread's ``random``-compatible RNG (global module by default)."""
    return getattr(_TLS, "py", None) or random


def nprand():
    """This thread's ``np.random``-compatible RNG (global by default)."""
    return getattr(_TLS, "np", None) or np.random
