"""Static dtype audit of the bf16 train step (docs/PERFORMANCE.md round 4).

Pins the bf16 MXU-rate claim WITHOUT TPU hardware: the train step is lowered
(traced, not compiled — platform-independent StableHLO) and every
convolution / dot_general's operand element types are asserted. Guards the
round-4 leak fix (models/rmnet.py: the f32 att-map multiply was silently
promoting the whole memory-read chain to f32) against regression.

Ground truth at the audited geometry (tools/audit_dots.py):
  * ALL convolutions (397) are bf16 x bf16 — the ResNet-50 / decoder /
    flownet FLOPs bulk rides the full-rate MXU path.
  * The two forward attention dots (affinity Ck=128 contraction, read
    Cv=512) are bf16 x bf16 -> f32-accumulate.
  * Exactly four f32 x f32 dots touch the attention chain: the DENSE
    backward (the scores cotangent is f32; JAX's dot transpose promotes
    qk/mk/mv). cfg.TRAIN.FLASH_ATTENTION=1 replaces these with the Pallas
    flash backward whose dots are bf16 (ds.astype(q.dtype) in the kernel) —
    the dense f32 backward is the portable fallback, not the TPU train path.
  * Every other f32 dot is the pinned tail by design: bilinear-resize tap
    matmuls and Lovász/aggregation smalls (f32-pinned: 1-1e-7 is
    unrepresentable in bf16; CLAUDE.md invariants).
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rmnet_tpu.config import Config
from rmnet_tpu.core.engine import build_models
from rmnet_tpu.core.train import make_loss_fn
from rmnet_tpu.models.rmnet import RMNetApply

_OP_RE = re.compile(
    r"(dot_general|convolution).*?:\s*\(tensor<([^>]*)>,\s*tensor<([^>]*)>\)"
    r"\s*->\s*tensor<([^>]*)>"
)


def _ops(text, kind):
    return [
        (m.group(2), m.group(3), m.group(4))
        for m in map(_OP_RE.search, text.splitlines())
        if m and m.group(1) == kind
    ]


def _tiny_batch(B=2, T=3, K=3, H=48, W=48):
    rs = np.random.RandomState(0)
    labels = np.zeros((B, T, H, W), np.uint8)
    labels[:, :, 8:24, 8:20] = 1
    labels[:, :, 28:44, 24:40] = 2
    return {
        "frames": rs.rand(B, T, H, W, 3).astype(np.float32),
        "masks": np.stack(
            [(labels == k) for k in range(K)], 2
        ).astype(np.float32),
        "flows": rs.rand(B, T, H, W, 2).astype(np.float32),
        "n_objects": np.full((B, T), K - 1, np.int32),
    }


@pytest.fixture(scope="module")
def bf16_grad_hlo():
    cfg = Config()
    cfg.TRAIN.NETWORK = "RMNet"
    cfg.TRAIN.BF16 = True
    rmnet, tflownet, rm_vars, _ = build_models(cfg, 0, jnp.bfloat16)
    apply = RMNetApply(rmnet, memorize_every=cfg.TRAIN.MEMORIZE_EVERY)
    loss_fn = make_loss_fn(cfg, apply, tflownet, remat="encoders")
    params = rm_vars["params"]
    extra = {k: v for k, v in rm_vars.items() if k != "params"}
    fn = jax.jit(jax.grad(loss_fn, has_aux=True))
    return fn.lower(params, extra, _tiny_batch()).as_text()


@pytest.mark.slow
def test_all_convolutions_are_bf16(bf16_grad_hlo):
    convs = _ops(bf16_grad_hlo, "convolution")
    assert len(convs) > 300  # fwd + bwd of two ResNet-50s, decoder, flownet
    not_bf16 = [c for c in convs if not ("bf16" in c[0] and "bf16" in c[1])]
    assert not not_bf16, (
        f"{len(not_bf16)} convolutions not bf16xbf16 (dtype leak): "
        f"{not_bf16[:5]}"
    )


@pytest.mark.slow
def test_forward_attention_dots_are_bf16(bf16_grad_hlo):
    dots = _ops(bf16_grad_hlo, "dot_general")
    # affinity: (N, M, 128) x (N, Q, 128) -> f32; read: (N, M, Q) x
    # (N, M, 512) -> f32. Identified by a bf16 operand ending in the
    # key/value channel dim with f32-accumulate output.
    fwd_att = [
        d for d in dots
        if d[0].endswith("bf16") and d[1].endswith("bf16")
        and d[2].endswith("f32")
        and (d[0].endswith("x128xbf16") or d[1].endswith("x512xbf16"))
    ]
    assert len(fwd_att) >= 2, f"forward attention dots not bf16: {dots}"


@pytest.mark.slow
def test_f32_dots_are_only_the_documented_tail(bf16_grad_hlo):
    dots = _ops(bf16_grad_hlo, "dot_general")
    f32 = [d for d in dots if d[0].endswith("f32") and d[1].endswith("f32")]

    def touches_attention(d):
        # rank-3 batched operand whose trailing dim is the key/value
        # channel width = the dense attention backward
        return any(
            t.count("x") == 3 and (t.endswith("x128xf32")
                                   or t.endswith("x512xf32"))
            for t in d[:2]
        )

    att_bwd = [d for d in f32 if touches_attention(d)]
    # exactly the 4 dense-backward dots (dqk, dmk, dp, dmv); everything
    # else f32 must be the small pinned tail (resize taps, Lovász)
    assert len(att_bwd) == 4, (
        f"dense attention backward expected 4 f32 dots, got "
        f"{len(att_bwd)}: {att_bwd}"
    )
