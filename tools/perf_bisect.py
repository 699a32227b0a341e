"""Fused-chunk cost bisection on the attached accelerator.

Stubs one pipeline component at a time INSIDE the compiled chunk program
(staged inputs, downloads excluded) and reports ms/frame per variant — the
per-dispatch tunnel floor (~3 ms) makes whole-chunk ablation the only
meaningful measurement on this setup (docs/PERFORMANCE.md).

Each variant runs in its own subprocess (monkeypatches are global, and the
TPU admits one process at a time anyway).

Usage:  python tools/perf_bisect.py            # all variants, sequential
        python tools/perf_bisect.py --one warp # single variant, in-process
Variants: full warp att memorize segment read decode tfn
"""

import subprocess
import sys
import time

import numpy as np

VARIANTS = ["full", "warp", "att", "memorize", "segment", "read", "decode", "tfn"]


def _patch(variant: str):
    import jax.numpy as jnp

    from rmnet_tpu.models import rmnet as rmnet_mod
    from rmnet_tpu.models.rmnet import RMNetApply

    if variant == "full" or variant == "tfn":
        return  # tfn variant is handled by feeding precomputed zero flows

    if variant == "warp":
        orig = RMNetApply.get_att_small
        RMNetApply.get_att_small = (
            lambda self, pm, fl, oh, off: orig(self, pm, None, oh, off)
        )
    elif variant == "att":
        RMNetApply.get_att_small = (
            lambda self, pm, fl, oh, off: jnp.ones(pm.shape[:2] + tuple(oh), pm.dtype)
        )
    elif variant == "memorize":
        def memorize_stub(self, variables, frame, masks, obj_valid):
            B, K, H, W = masks.shape
            h = (H + (16 - H % 16) % 16) // 16
            w = (W + (16 - W % 16) % 16) // 16
            k4 = jnp.zeros((B, K, h, w, 128), frame.dtype)
            v4 = jnp.zeros((B, K, h, w, 512), frame.dtype)
            return k4, v4, jnp.zeros((B, K, 4), jnp.int32), None

        RMNetApply.memorize = memorize_stub
    elif variant == "segment":
        def segment_stub(self, variables, frame, att_small, mk, mv, sv, ov):
            B, K = mk.shape[:2]
            H, W = frame.shape[1:3]
            logit = jnp.zeros((B, K, H, W), frame.dtype) + jnp.sum(att_small) * 0
            return logit, None

        RMNetApply.segment = segment_stub
    elif variant == "read":
        rmnet_mod.memory_read = lambda mk, mv, qk, qv, sv: (
            jnp.concatenate([qv, qv], axis=-1) + jnp.sum(mk) * 0, None
        )
    elif variant == "decode":
        orig_apply = RMNetApply._apply

        def apply_stub(self, variables, method, *args):
            if method == "decode_from_skips":
                m4 = args[0]
                return jnp.zeros(
                    (m4.shape[0], m4.shape[1] * 16, m4.shape[2] * 16, 2), m4.dtype
                ) + jnp.sum(m4) * 0
            return orig_apply(self, variables, method, *args)

        RMNetApply._apply = apply_stub
    else:
        raise SystemExit(f"unknown variant {variant}")


def run_variant(variant: str):
    import jax
    import jax.numpy as jnp

    from rmnet_tpu.config import Config
    from rmnet_tpu.core.engine import InferenceEngine, build_models

    _patch(variant)

    T, H, W, K, CHUNK = 48, 480, 854, 3, 8
    cfg = Config()
    cfg.TEST.MEMORY_CAPACITY = max(T // cfg.TEST.MEMORIZE_EVERY + 2, 4)
    _, _, rm_vars, tfn_vars = build_models(cfg, 0, dtype=None)
    engine = InferenceEngine(cfg, rm_vars, tfn_vars, dtype=jnp.bfloat16, chunk=CHUNK)

    rs = np.random.RandomState(0)
    frames = rs.rand(T, H, W, 3).astype(np.float32) * 2 - 1
    labels = np.zeros((T, H, W), np.uint8)
    for t in range(T):
        y = 100 + 2 * t
        labels[t, y:y + 120, 150:300] = 1
        labels[t, y + 40:y + 180, 450:620] = 2
    masks = np.stack([(labels == k) for k in range(K)], 1).astype(np.uint8)
    n_objects = np.full((T,), K - 1, np.int32)

    any_new, commit = engine._video_flags(n_objects, T)
    obj_valid = jnp.asarray(((np.arange(K) >= 1) & (np.arange(K) <= K - 1))[None])
    use_tfn = variant != "tfn"
    chunk_fn = engine._get_chunk_fn(use_tfn_flow=use_tfn, return_probs=False,
                                    capacity=engine.capacity)

    staged = []
    t = 1
    while t < T:
        end = min(t + CHUNK, T)
        n_pad = CHUNK - (end - t)

        def pad_tail(a):
            return np.concatenate([a, np.repeat(a[-1:], n_pad, 0)], 0) if n_pad else a

        item = [
            jax.device_put(pad_tail(frames[t:end])[:, None]),
            jax.device_put(pad_tail(masks[t:end]).astype(np.float32)[:, None]),
            jax.device_put(pad_tail(any_new[t:end])),
            jax.device_put(pad_tail(commit[t - 1:end - 1])),
            jax.device_put(np.arange(CHUNK) < (end - t)),
        ]
        if not use_tfn:
            item.append(jax.device_put(np.zeros((CHUNK, 1, H, W, 2), np.float32)))
        staged.append(item)
        t = end

    def run_once():
        state = engine.apply.init_state(
            jnp.asarray(frames[None, 0]),
            jnp.asarray(masks[None, 0].astype(np.float32)),
            capacity=engine.capacity,
            dtype=jnp.bfloat16,
        )
        last = None
        for item in staged:
            args = [engine.rmnet_vars, engine.tfn_vars, state] + item[:5] + [obj_valid] + item[5:]
            state, last = chunk_fn(*args)
        np.asarray(last.ravel()[:1])  # tunnel-safe sync
        return last

    run_once()  # compile + warm
    times = []
    for _ in range(3):
        tic = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - tic)
    ms = min(times) / (T - 1) * 1000
    print(f"{variant:10s} {ms:7.2f} ms/frame   "
          f"runs={[round(x / (T - 1) * 1000, 2) for x in times]}", flush=True)


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--one":
        run_variant(sys.argv[2])
        return
    variants = sys.argv[1:] or VARIANTS
    for v in variants:
        subprocess.run([sys.executable, __file__, "--one", v], check=False)


if __name__ == "__main__":
    main()
