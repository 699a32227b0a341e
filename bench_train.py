"""Training-step benchmark on the attached accelerator.

Measures the full jitted train step (RMNet forward scan + BPTT + Adam,
per-frame remat) at the reference training scale: B=4, T=3, K=4 object
slots, 465x465 crops (config.py TRAIN.* defaults = reference config.py).
Prints ONE JSON line:

    {"metric": ..., "value": s/step, "unit": "s/step",
     "flops_per_step": ..., "est_mfu": ...}

There is no reference train-throughput baseline (the repo publishes none,
BASELINE.md); this tracks round-over-round training perf the way bench.py
tracks inference.
"""

import json
import os
import sys
import time

import numpy as np


# TPU v5e peak: 197 TFLOP/s bf16 (f32 matmuls run at half rate)
_PEAK_FLOPS = {"bf16": 197e12, "f32": 98.5e12}


def main():
    import jax
    import jax.numpy as jnp

    from rmnet_tpu.config import Config
    from rmnet_tpu.core.engine import build_models
    from rmnet_tpu.core.train import make_optimizer, make_train_step
    from rmnet_tpu.models.rmnet import RMNetApply

    bf16 = "--bf16" in sys.argv
    flash = "--flash" in sys.argv  # block-sparse read in the train step
    B = int(os.environ.get("BENCH_TRAIN_BATCH", "4"))
    T = int(os.environ.get("BENCH_TRAIN_FRAMES", "3"))
    K = int(os.environ.get("BENCH_TRAIN_OBJECTS", "3")) + 1
    HW = int(os.environ.get("BENCH_TRAIN_SIZE", "465"))
    # bisection knobs (perf experiments; defaults = the real train recipe)
    remat = os.environ.get("BENCH_TRAIN_REMAT", "encoders")  # step|encoders|none
    loss_sel = os.environ.get("BENCH_TRAIN_LOSS", "both")  # both|nll|lovasz|none

    cfg = Config()
    cfg.TRAIN.BF16 = bf16
    cfg.TRAIN.FLASH_ATTENTION = flash
    dtype = jnp.bfloat16 if bf16 else None
    rmnet, tflownet, rm_vars, tfn_vars = build_models(cfg, 0, dtype)
    apply = RMNetApply(rmnet, memorize_every=cfg.TRAIN.MEMORIZE_EVERY)
    optimizer = make_optimizer(cfg)
    params = jax.device_put(rm_vars["params"])
    extra = {k: jax.device_put(v) for k, v in rm_vars.items() if k != "params"}
    opt_state = jax.device_put(optimizer.init(params))
    if loss_sel != "both":  # loss-term ablation for the perf bisection
        import rmnet_tpu.core.train as train_mod

        zero = lambda *a, **k: jnp.zeros((), jnp.float32)
        # "mean": cheap but DATA-DEPENDENT stand-in — prices the network
        # fwd+bwd alone. (A literal zero loss has zero gradient and XLA
        # DCEs the entire model: measured 0.049 s/step, 0.3 GFLOP.)
        mean = lambda p, *a, **k: jnp.mean(p.astype(jnp.float32))
        if loss_sel in ("nll", "none"):
            train_mod.lovasz_loss = zero
        if loss_sel in ("lovasz", "none"):
            train_mod.nll_loss = zero
        if loss_sel == "mean":
            train_mod.lovasz_loss = mean
            train_mod.nll_loss = zero
    train_step = make_train_step(cfg, apply, tflownet, optimizer, remat=remat)

    rs = np.random.RandomState(0)
    labels = rs.randint(0, K, (B, T, HW, HW))
    batch = {
        "frames": rs.rand(B, T, HW, HW, 3).astype(np.float32) * 2 - 1,
        "masks": np.moveaxis(np.eye(K, dtype=np.float32)[labels], -1, 2),
        "flows": (rs.rand(B, T, HW, HW, 2).astype(np.float32) - 0.5) * 4,
        "n_objects": np.full((B, T), K - 1, np.int32),
    }
    batch = {k: jax.device_put(v) for k, v in batch.items()}
    lr = jnp.asarray(1e-5)

    # compiled-cost introspection for the MFU estimate (best effort)
    flops = None
    try:
        lowered = jax.jit(
            lambda p, o, e, b: train_step(p, o, e, b, lr)
        ).lower(params, opt_state, extra, batch)
        flops = float(lowered.compile().cost_analysis()["flops"])
    except Exception:
        pass

    def sync(tree):
        leaf = jax.tree_util.tree_leaves(tree)[0]
        np.asarray(leaf.ravel()[:1])  # tunnel-safe device sync (docs/PERFORMANCE.md)

    # donation: re-feed outputs as inputs each pass
    p, o, e = params, opt_state, extra
    p, o, e, loss = train_step(p, o, e, batch, lr)  # compile + warm
    sync(p)

    from rmnet_tpu.utils.profiling import trace_if

    times = []
    with trace_if():  # RMNET_TRACE_DIR=<dir> captures a profiler trace
        for _ in range(3):
            tic = time.perf_counter()
            p, o, e, loss = train_step(p, o, e, batch, lr)
            sync(p)
            times.append(time.perf_counter() - tic)
    sec = float(np.median(times))

    est_mfu = None
    if flops:
        est_mfu = round(flops / sec / _PEAK_FLOPS["bf16" if bf16 else "f32"], 4)

    print(json.dumps({
        "metric": f"train step B={B} T={T} K={K - 1}obj {HW}x{HW} "
                  f"{'bf16' if bf16 else 'f32'} (fwd scan + BPTT + Adam, "
                  f"remat={remat}" + (", flash" if flash else "")
                  + (f", loss={loss_sel}" if loss_sel != "both" else "") + ")",
        "value": round(sec, 4),
        "unit": "s/step",
        "flops_per_step": flops,
        "est_mfu": est_mfu,
        "runs": [round(t, 4) for t in times],
        "loss": float(loss),
    }))


if __name__ == "__main__":
    main()
