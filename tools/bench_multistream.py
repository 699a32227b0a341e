"""Aggregate-throughput benchmark: N lockstep 480p VOS streams per chip.

Single-stream streaming VOS is latency-bound on TPU — per-frame matmuls sit
far below MXU saturation (bench.py est_mfu_device ~0.016) — so serving N
videos batched on the model batch axis (engine.run_videos*) should multiply
aggregate FPS/chip at sub-linear step-latency growth. This tool measures
that curve on the live chip with bench.py's methodology (staged HBM inputs,
dedicated warmups, median-of-5 for BOTH the e2e and device-only loops,
device-only runs synced with a 1-element download).

Usage:  python tools/bench_multistream.py            # N in {1, 2, 4}
        MS_STREAMS=1,2,4,8 BENCH_FRAMES=48 python tools/bench_multistream.py

Prints one JSON line per stream count:
  {"streams": N, "agg_device_fps": ..., "per_stream_device_fps": ...,
   "agg_fps_e2e": ..., "ms_per_step_device": ...}

The e2e number downloads N label streams over this dev box's ~8 MB/s tunnel
(not representative of real v5e host IO) and times the downloads only — the
host-side _unpack_labels/argmax that engine.run_videos_labels also performs
is excluded (it overlaps device compute in the real path, but strictly
agg_fps_e2e is a transfer+compute number). agg_device_fps is the chip
capability. Reference serves one video at a time (core/test.py:59-118).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from rmnet_tpu.config import Config
    from rmnet_tpu.core.engine import InferenceEngine, build_models

    stream_counts = [int(s) for s in
                     os.environ.get("MS_STREAMS", "1,2,4").split(",")]
    T = int(os.environ.get("BENCH_FRAMES", "48"))
    H, W = map(int, os.environ.get("BENCH_HW", "480,854").split(","))
    K = int(os.environ.get("BENCH_OBJECTS", "2")) + 1
    CHUNK = int(os.environ.get("BENCH_CHUNK", "16"))
    bf16 = "--f32" not in sys.argv
    use_flash = os.environ.get("RMNET_FLASH", "1") == "1"

    cfg = Config()
    cfg.TEST.MEMORY_CAPACITY = max(T // cfg.TEST.MEMORIZE_EVERY + 2, 4)
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    _, _, rm_vars, tfn_vars = build_models(cfg, 0, dtype=None)

    # one base video; per-stream content differs by a roll (keeps host-side
    # generation cheap; the chip sees N distinct pixel streams)
    rs = np.random.RandomState(0)
    base = rs.rand(T, H, W, 3).astype(np.float32) * 2 - 1
    labels = np.zeros((T, H, W), np.uint8)
    for t in range(T):
        y = 100 + 2 * t
        labels[t, y:y + 120, 150:300] = 1
        if K > 2:
            labels[t, y + 40:y + 180, 450:620] = 2
        # objects 3..: fixed grid + small cyclic drift. Every object gets a
        # REAL localized regional box — an empty slot would fall back to
        # the whole-frame bbox (n_pts<10, reference CUDA semantics) and
        # erase the regional sparsity the K-scaling sweep is measuring.
        for k in range(3, K):
            r, c = divmod(k - 3, 3)
            y0 = 270 + 80 * r + 2 * (t % 20)
            x0 = 30 + 280 * c
            labels[t, y0:y0 + 70, x0:x0 + 110] = k
    masks = np.stack([(labels == k) for k in range(K)], 1).astype(np.float32)
    n_objects = np.full((T,), K - 1, np.int32)

    for N in stream_counts:
        engine = InferenceEngine(cfg, rm_vars, tfn_vars, dtype=dtype,
                                 chunk=CHUNK, use_flash_attention=use_flash)
        any_new, commit = engine._video_flags(n_objects, T)
        obj_valid = jnp.asarray(
            np.broadcast_to((np.arange(K) >= 1) & (np.arange(K) <= K - 1),
                            (N, K)).copy())

        frames_tm = np.stack(
            [np.roll(base, 37 * i, axis=2) for i in range(N)], axis=1
        )                                                  # (T, N, H, W, 3)
        masks_tm = np.repeat(masks[:, None], N, axis=1)    # (T, N, K, H, W)

        staged = []
        t = 1
        for size in engine._chunk_plan(T - 1):
            if t >= T:
                break
            end = min(t + size, T)
            n_pad = size - (end - t)

            def pad_tail(a):
                return (np.concatenate([a, np.repeat(a[-1:], n_pad, 0)], 0)
                        if n_pad else a)

            staged.append((
                jax.device_put(pad_tail(frames_tm[t:end])),
                jax.device_put(pad_tail(masks_tm[t:end])),
                jax.device_put(pad_tail(any_new[t:end])),
                jax.device_put(pad_tail(commit[t - 1:end - 1])),
                jax.device_put(np.arange(size) < (end - t)),
                end - t,
            ))
            t = end
        f0 = jax.device_put(frames_tm[0])
        m0 = jax.device_put(masks_tm[0])

        chunk_fn = engine._get_chunk_fn(use_tfn_flow=True, return_probs=False)
        _copy = jax.jit(lambda a: a + 0)

        def fresh_state():
            return engine.apply.init_state(_copy(f0), _copy(m0),
                                           capacity=engine.capacity,
                                           dtype=dtype)

        def run_e2e():
            state = fresh_state()
            pending = None
            for f_c, g_c, new_c, com_c, valid_c, n_live in staged:
                state, est = chunk_fn(engine.rmnet_vars, engine.tfn_vars,
                                      state, f_c, g_c, new_c, com_c, valid_c,
                                      obj_valid)
                try:
                    est.copy_to_host_async()
                except Exception:
                    pass
                if pending is not None:
                    np.asarray(pending[0])
                pending = (est, n_live)
            np.asarray(pending[0])

        def run_device():
            state = fresh_state()
            last = None
            for f_c, g_c, new_c, com_c, valid_c, n_live in staged:
                state, last = chunk_fn(engine.rmnet_vars, engine.tfn_vars,
                                       state, f_c, g_c, new_c, com_c, valid_c,
                                       obj_valid)
            np.asarray(last.ravel()[:1])  # tunnel-safe device sync

        run_e2e()  # compile + warm
        e2e = []
        for _ in range(5):
            tic = time.perf_counter()
            run_e2e()
            e2e.append(N * (T - 1) / (time.perf_counter() - tic))
        run_device()  # dedicated device-only warmup
        dev = []
        for _ in range(5):
            tic = time.perf_counter()
            run_device()
            dev.append(N * (T - 1) / (time.perf_counter() - tic))

        agg_dev = float(np.median(dev))
        print(json.dumps({
            "streams": N,
            "agg_device_fps": round(agg_dev, 2),
            "agg_device_fps_best": round(max(dev), 2),
            "per_stream_device_fps": round(agg_dev / N, 2),
            "agg_fps_e2e": round(float(np.median(e2e)), 2),
            "ms_per_step_device": round(1000.0 * N / agg_dev, 3),
            "read": "flash" if use_flash else "dense",
            "dtype": "bf16" if bf16 else "f32",
            "frames": T, "hw": [H, W], "objects": K - 1,
        }), flush=True)


if __name__ == "__main__":
    main()
