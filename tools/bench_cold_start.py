"""Cold-start measurement for the persistent compilation cache (round 5).

Every new process serving checkpoints pays the first-engine compile —
round-4 measured ~50 s for the eval_server's first checkpoint at 480p
including the flash read's Mosaic compile (docs/PERFORMANCE.md). The
persistent cache (rmnet_tpu/utils/compile_cache.py, enabled by every
engine) should carry those executables across processes.

Protocol (two runs of THIS script in fresh processes):

    D=/tmp/xla-cache-probe-$$
    RMNET_COMPILE_CACHE_DIR=$D python tools/bench_cold_start.py   # cold
    RMNET_COMPILE_CACHE_DIR=$D python tools/bench_cold_start.py   # warm

Prints ONE JSON line: time to engine build, to first chunk dispatch
(compile + execute), and to a full short video — the eval_server
first-checkpoint shape. Compare cold vs warm `first_video_s`.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp

    from rmnet_tpu.config import Config
    from rmnet_tpu.core.engine import InferenceEngine, build_models

    T = int(os.environ.get("BENCH_FRAMES", "17"))
    H, W = map(int, os.environ.get("BENCH_HW", "480,854").split(","))
    K = int(os.environ.get("BENCH_OBJECTS", "2")) + 1
    bf16 = "--f32" not in sys.argv
    use_flash = os.environ.get("RMNET_FLASH", "1") == "1"

    t0 = time.perf_counter()
    cfg = Config()
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    _, _, rm_vars, tfn_vars = build_models(cfg, 0, dtype=None)
    engine = InferenceEngine(cfg, rm_vars, tfn_vars, dtype=dtype, chunk=16,
                             use_flash_attention=use_flash)
    t_build = time.perf_counter() - t0

    rs = np.random.RandomState(0)
    frames = rs.rand(T, H, W, 3).astype(np.float32) * 2 - 1
    labels = np.zeros((T, H, W), np.uint8)
    for t in range(T):
        labels[t, 100:220, 150:300] = 1
        if K > 2:
            labels[t, 140:280, 450:620] = 2
    masks = np.stack([(labels == k) for k in range(K)], 1).astype(np.float32)
    n_objects = np.full((T,), K - 1, np.int32)

    t1 = time.perf_counter()
    out = engine.run_video_labels(frames, masks, n_objects)
    t_video = time.perf_counter() - t1
    assert out.shape == (T, H, W)

    print(json.dumps({
        "cache_dir": os.environ.get("RMNET_COMPILE_CACHE_DIR", "<default>"),
        "build_s": round(t_build, 2),
        "first_video_s": round(t_video, 2),
        "total_s": round(time.perf_counter() - t0, 2),
        "read": "flash" if use_flash else "dense",
        "dtype": "bf16" if bf16 else "f32",
        "frames": T, "hw": [H, W], "objects": K - 1,
    }), flush=True)


if __name__ == "__main__":
    main()
