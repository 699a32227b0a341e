"""Dump the dot_general inventory of the (bf16) train step's lowered HLO.

Static dtype audit (no execution, CPU-safe): lists every stablehlo.dot_general
in the lowered forward+backward train loss with its operand element types and
shapes, so the bf16 MXU-rate claim (docs/PERFORMANCE.md round 4) can be
checked without TPU hardware. tests/test_bf16_dtypes.py asserts the
load-bearing subset; this tool prints the full inventory for eyeballing.

Usage: python tools/audit_dots.py [--f32] [--fwd-only]
"""

import re
import sys


def lowered_text(bf16: bool, fwd_only: bool) -> str:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from rmnet_tpu.config import Config
    from rmnet_tpu.core.engine import build_models
    from rmnet_tpu.core.train import make_loss_fn
    from rmnet_tpu.models.rmnet import RMNetApply

    cfg = Config()
    cfg.TRAIN.NETWORK = "RMNet"
    cfg.TRAIN.BF16 = bf16
    dtype = jnp.bfloat16 if bf16 else None
    rmnet, tflownet, rm_vars, _ = build_models(cfg, 0, dtype)
    apply = RMNetApply(rmnet, memorize_every=cfg.TRAIN.MEMORIZE_EVERY)
    loss_fn = make_loss_fn(cfg, apply, tflownet, remat="encoders")

    B, T, K, H, W = 2, 3, 3, 48, 48
    rs = np.random.RandomState(0)
    labels = np.zeros((B, T, H, W), np.uint8)
    labels[:, :, 8:24, 8:20] = 1
    labels[:, :, 28:44, 24:40] = 2
    batch = {
        "frames": rs.rand(B, T, H, W, 3).astype(np.float32),
        "masks": np.stack([(labels == k) for k in range(K)], 2).astype(
            np.float32
        ),
        "flows": rs.rand(B, T, H, W, 2).astype(np.float32),
        "n_objects": np.full((B, T), K - 1, np.int32),
    }
    params = rm_vars["params"]
    extra = {k: v for k, v in rm_vars.items() if k != "params"}
    if fwd_only:
        fn = jax.jit(loss_fn)
    else:
        fn = jax.jit(jax.grad(loss_fn, has_aux=True))
    return fn.lower(params, extra, batch).as_text()


DOT_RE = re.compile(
    r"(dot_general|convolution).*?:\s*\(tensor<([^>]*)>,\s*tensor<([^>]*)>\)"
    r"\s*->\s*tensor<([^>]*)>"
)


def parse_dots(text: str, kind: str = "dot_general"):
    out = []
    for line in text.splitlines():
        m = DOT_RE.search(line)
        if m and m.group(1) == kind:
            out.append(tuple(m.group(i) for i in (2, 3, 4)))
    return out


def main():
    bf16 = "--f32" not in sys.argv
    fwd_only = "--fwd-only" in sys.argv
    text = lowered_text(bf16, fwd_only)
    from collections import Counter

    for kind in ("dot_general", "convolution"):
        c = Counter(parse_dots(text, kind))
        print(f"== {kind} ==")
        for (a, b, o), n in sorted(c.items()):
            print(f"{n:3d}x  ({a}) x ({b}) -> {o}")
        n_bf16 = sum(n for (a, b, _), n in c.items()
                     if "bf16" in a and "bf16" in b)
        n_f32 = sum(n for (a, b, _), n in c.items()
                    if a.endswith("f32") and b.endswith("f32"))
        n_mixed = sum(c.values()) - n_bf16 - n_f32
        print(f"total={sum(c.values())}  bf16xbf16={n_bf16}  "
              f"f32xf32={n_f32}  mixed={n_mixed}\n")


if __name__ == "__main__":
    main()
