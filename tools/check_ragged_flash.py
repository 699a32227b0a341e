"""Live-chip validation of ragged multi-stream serving with the flash read.

The per-stream (B,)-cursor path (round 5) is parity-tested on CPU against
single-video serving — but only with the dense XLA read (CPU can't compile
Mosaic kernels). This script runs a mixed batch (different lengths AND
different commit schedules) on the attached TPU twice — block-sparse flash
read vs dense — and against per-video dense runs, and reports max label
disagreement. Run whenever the serving kernels change:

    PYTHONPATH=/root/.axon_site python tools/check_ragged_flash.py

Measured (round 5, docs/bench_logs_r05_raggedcheck.txt): at f32 the
batched and single paths agree EXACTLY (0.0 mismatch on TPU and CPU, all
three schedules) — the per-stream cursor logic is correct. At bf16 with
RANDOM weights the videos with mid-video object injection flip 5-12% of
labels: untrained probs are near-uniform, so the batched program's
different reduction order flips argmaxes that then amplify through the
frame feedback loop (est mask -> warp/att-map -> memory commit). The
no-injection video stays at 2e-5. With trained (confident) weights the
bf16 gap is expected to collapse to boundary ties; re-run this check
whenever a real checkpoint lands (CHECK_DTYPE=f32|bf16 selects).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_video(seed, x0, appear_t, T, H, W, K):
    rs = np.random.RandomState(seed)
    frames = rs.rand(T, H, W, 3).astype(np.float32) * 2 - 1
    labels = np.zeros((T, H, W), np.uint8)
    for t in range(T):
        y = 100 + 2 * t
        labels[t, y:y + 120, x0:x0 + 150] = 1
        if t >= appear_t:
            labels[t, y + 40:y + 180, x0 + 220:x0 + 390] = 2
    masks = np.stack([(labels == k) for k in range(K)], 1).astype(np.float32)
    n_objects = np.where(np.arange(T) >= appear_t, 2, 1).astype(np.int64)
    return frames, masks, n_objects


def main():
    import jax.numpy as jnp

    from rmnet_tpu.config import Config
    from rmnet_tpu.core.engine import InferenceEngine, build_models

    H, W, K = (int(x) for x in os.environ.get("CHECK_HWK", "480,854,3").split(","))
    dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32}[
        os.environ.get("CHECK_DTYPE", "bf16")
    ]
    cfg = Config()
    _, _, rm_vars, tfn_vars = build_models(cfg, 0, dtype=None)

    vids = [
        make_video(0, 120, appear_t=1, T=12, H=H, W=W, K=K),
        make_video(1, 200, appear_t=4, T=9, H=H, W=W, K=K),   # later commit
        make_video(2, 60, appear_t=99, T=7, H=H, W=W, K=K),   # 1 object
    ]

    results = {}
    outs = {}
    for name, flash in (("dense", False), ("flash", True)):
        engine = InferenceEngine(cfg, rm_vars, tfn_vars, dtype=dtype,
                                 chunk=8, use_flash_attention=flash)
        outs[name] = engine.run_video_batch(vids)
        if not flash:
            singles = [engine.run_video_labels(f, m, n) for f, m, n in vids]
            mism = [float((o != s).mean()) for o, s in zip(outs["dense"], singles)]
            results["batched_vs_single_dense_mismatch"] = mism

    flash_mism = [
        float((a != b).mean()) for a, b in zip(outs["dense"], outs["flash"])
    ]
    results["flash_vs_dense_batched_mismatch"] = flash_mism
    results["ok"] = bool(
        max(results["batched_vs_single_dense_mismatch"]) < 1e-3
        and max(flash_mism) < 1e-3
    )
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
