"""Persistent XLA/Mosaic compilation cache (opt-out).

Every process that builds an :class:`~rmnet_tpu.core.engine.InferenceEngine`
pays the same compiles: ~25-50 s of Mosaic for each flash-read geometry and
tens of seconds of XLA for the chunk programs (docs/PERFORMANCE.md,
engine-reuse section). The reference has no equivalent concern — PyTorch
kernels are precompiled — but under jit the compile cost recurs per process:
eval_server restarts, bench runs, and every farm worker each paid it.

JAX ships a persistent on-disk cache keyed by the serialized HLO + compile
options + backend; enabling it is one config flag. This helper centralizes
that flag so the long-running entry points (runner, eval server, benches,
engines) all share one cache directory.

Environment:
  RMNET_COMPILE_CACHE=0       disable (default: enabled)
  RMNET_COMPILE_CACHE_DIR=P   cache directory
                              (default ~/.cache/rmnet_tpu/xla-cache)

Measured effect (live TPU v5e tunnel, docs/PERFORMANCE.md "Persistent
compilation cache"): see that table for the cold/warm engine build times.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

_DEFAULT_DIR = "~/.cache/rmnet_tpu/xla-cache"
_enabled_path: Optional[str] = None


def enable_persistent_cache(path: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at a shared directory.

    Safe to call any number of times and at any point before (or after)
    the first compile — entries compiled earlier in the process simply
    aren't persisted. Returns the cache directory, or None when disabled
    (RMNET_COMPILE_CACHE=0) or unsupported by the installed jax.
    """
    global _enabled_path
    if os.environ.get("RMNET_COMPILE_CACHE", "1") == "0":
        return None
    if _enabled_path is not None:
        return _enabled_path

    import jax

    path = os.path.expanduser(
        path or os.environ.get("RMNET_COMPILE_CACHE_DIR") or _DEFAULT_DIR
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # persist anything that took >=1 s to compile (the default 1 s floor
        # also avoids churning the disk with trivial programs); cache across
        # differently-numbered processes on the same box
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as ex:  # pragma: no cover - version-dependent flags
        logging.debug("persistent compilation cache unavailable: %r", ex)
        return None
    _enabled_path = path
    return path
