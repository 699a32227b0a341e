"""Micro-timing of hot ops on the attached accelerator.

Loops an op N times inside ONE compiled lax.fori_loop with a data
dependency between iterations, so per-op time = wall / N and the ~3 ms
tunnel dispatch floor amortizes away.

Usage: python tools/perf_micro.py [name ...]
"""

import sys
import time

import numpy as np


def timed(name, fn, *args, n=50):
    import jax
    import jax.numpy as jnp

    def loop(*xs):
        # chain iterations through a full-reduction of the output (x0 + 0),
        # so nothing DCEs and per-op time = wall / n
        def body(i, x0):
            out = fn(x0, *xs[1:])
            leaf = out[0] if isinstance(out, tuple) else out
            eps = (jnp.sum(leaf.astype(jnp.float32)) * 0).astype(x0.dtype)
            return x0 + eps

        return jax.lax.fori_loop(0, n, body, xs[0])

    jl = jax.jit(loop)
    out = jl(*args)
    np.asarray(out.ravel()[:1])  # sync (tunnel-safe)
    best = np.inf
    for _ in range(3):
        tic = time.perf_counter()
        out = jl(*args)
        np.asarray(out.ravel()[:1])
        best = min(best, time.perf_counter() - tic)
    print(f"{name:28s} {best / n * 1000:8.3f} ms/op", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from rmnet_tpu.ops.att_map import regional_attention_small
    from rmnet_tpu.ops.warp import backward_warp, backward_warp_quantized

    which = set(sys.argv[1:])
    rs = np.random.RandomState(0)
    B, K, H, W = 1, 3, 480, 854
    mask = jnp.asarray(rs.rand(B, K, H, W).astype(np.float32)).astype(jnp.bfloat16)
    flow = jnp.asarray(((rs.rand(B, H, W, 2) - 0.5) * 8).astype(np.float32)).astype(jnp.bfloat16)
    img = jnp.asarray(rs.rand(B, H, W, K - 1).astype(np.float32)).astype(jnp.bfloat16)

    def want(n):
        return not which or n in which

    if want("att_small"):
        timed("att_small(480p,K=3,bf16)",
              lambda m: regional_attention_small(m, (30, 54), (0, 5))[0], mask)
    if want("warp_bf16"):
        timed("warp bf16 2-gather (K-1=2)",
              lambda im: backward_warp(im, flow)[0], img)
    if want("warp_u8"):
        timed("warp u8 1-gather (K-1=2)",
              lambda im: backward_warp_quantized(im, flow)[0], img)
    if want("tfn"):
        from rmnet_tpu.config import Config
        from rmnet_tpu.core.engine import build_models
        from rmnet_tpu.models.tiny_flownet import TinyFlowNet

        _, tfn, _, tfn_vars = build_models(Config(), 0, dtype=None)
        tfn_b = TinyFlowNet(dtype=jnp.bfloat16)
        tfn_vars = jax.device_put(tfn_vars)
        f0 = jnp.asarray(rs.rand(1, H, W, 3).astype(np.float32))
        f1 = jnp.asarray(rs.rand(1, H, W, 3).astype(np.float32))

        timed("tinyflownet pair (480p)",
              lambda a: tfn_b.apply(tfn_vars, a, f1, method="pair_forward"),
              f0, n=20)
    if want("lovasz"):
        # train-step loss bisection (round 3): price the Lovász machinery
        # at the real training shape — B*T-1 frames of 465^2, C=4 classes
        from rmnet_tpu.ops.losses import lovasz_loss

        Np = 4 * 2 * 480 * 480  # padded 465 -> 480
        C = 4
        probs = jnp.asarray(rs.rand(Np, C).astype(np.float32))
        probs = probs / probs.sum(-1, keepdims=True)
        labels = jnp.asarray(rs.randint(0, C, (Np,)).astype(np.int32))

        # CAUTION: keep n small here. Chaining fwd+bwd (two 1.8M-element
        # variadic sorts each) through a fori_loop makes a program whose
        # XLA compile can exceed 20 MINUTES — and killing the client
        # mid-compile has wedged the tunneled-TPU dev setup outright
        # (round-3 incident; the remote backend never recovered in-session)
        timed("lovasz fwd (1.84M px, C=4)",
              lambda p: lovasz_loss(p, labels), probs, n=10)
        timed("lovasz fwd+bwd",
              lambda p: jax.grad(lambda q: lovasz_loss(q, labels))(p), probs, n=2)
        err = jnp.asarray(rs.rand(C, Np).astype(np.float32))
        timed("argsort (C=4 x 1.84M)",
              lambda e: jnp.argsort(-e, axis=-1).astype(jnp.float32), err, n=10)
        iota = jnp.broadcast_to(jnp.arange(Np, dtype=jnp.int32), (C, Np))
        fg = jnp.asarray((rs.rand(C, Np) < 0.3).astype(np.float32))
        timed("lax.sort 3-op num_keys=2",
              lambda e: jax.lax.sort((e, iota, fg), dimension=-1, num_keys=2)[0],
              err, n=10)
        timed("scatter-set (C=4 x 1.84M)",
              lambda e: jnp.zeros_like(e).at[
                  jnp.arange(C)[:, None], iota
              ].set(e), err, n=10)
    if want("trainops"):
        # price the train-step's component fwd+bwd at B=4 T-step shapes
        # (465 -> 480 padded, K=3 objects, S=3 bank slots)
        import jax as _jax
        from rmnet_tpu.ops.aggregation import soft_aggregation
        from rmnet_tpu.models.rmnet import memory_read
        from rmnet_tpu.models.resnet import ResNet50Trunk

        Bt, Ht, Wt, Ko = 4, 480, 480, 3
        img_t = jnp.asarray(rs.rand(Bt, Ht, Wt, Ko).astype(np.float32))
        flow_t = jnp.asarray(((rs.rand(Bt, Ht, Wt, 2) - 0.5) * 8).astype(np.float32))
        timed("train warp fwd (480sq,K=3)",
              lambda im: backward_warp(im, flow_t)[0], img_t, n=20)
        timed("train warp fwd+bwd",
              lambda im: _jax.grad(
                  lambda x: jnp.sum(backward_warp(x, flow_t)[0])
              )(im), img_t, n=20)

        ps_t = jnp.asarray(rs.rand(Bt, Ko + 1, Ht, Wt).astype(np.float32))
        ov_t = jnp.asarray(np.ones((Bt, Ko + 1), bool))
        timed("soft_aggregation fwd",
              lambda p: soft_aggregation(p, ov_t), ps_t, n=20)
        timed("soft_aggregation fwd+bwd",
              lambda p: _jax.grad(
                  lambda x: jnp.sum(soft_aggregation(x, ov_t))
              )(p), ps_t, n=20)

        S3, h3, w3 = 3, 30, 30
        mk3 = jnp.asarray(rs.rand(Bt * Ko, S3, h3, w3, 128).astype(np.float32))
        mv3 = jnp.asarray(rs.rand(Bt * Ko, S3, h3, w3, 512).astype(np.float32))
        qk3 = jnp.asarray(rs.rand(Bt * Ko, h3, w3, 128).astype(np.float32))
        qv3 = jnp.asarray(rs.rand(Bt * Ko, h3, w3, 512).astype(np.float32))
        sv3 = jnp.ones((Bt * Ko, S3), bool)
        timed("memory_read fwd (train S=3)",
              lambda k: memory_read(k, mv3, qk3, qv3, sv3)[0], mk3, n=20)
        timed("memory_read fwd+bwd",
              lambda k: _jax.grad(
                  lambda x: jnp.sum(memory_read(x, mv3, qk3, qv3, sv3)[0])
              )(k), mk3, n=20)

        trunk = ResNet50Trunk()
        tv = trunk.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        x12 = jnp.asarray(rs.rand(12, Ht, Wt, 3).astype(np.float32))
        timed("resnet50 trunk fwd (12x480sq)",
              lambda x: trunk.apply(tv, x)[0], x12, n=10)
        timed("resnet50 trunk fwd+bwd",
              lambda x: _jax.grad(
                  lambda y: jnp.sum(trunk.apply(tv, y)[0].astype(jnp.float32))
              )(x), x12, n=10)
    if want("softmax_read"):
        S, h, w = 12, 30, 54
        mk = jnp.asarray(rs.rand(2, S, h, w, 128).astype(np.float32)).astype(jnp.bfloat16)
        mv = jnp.asarray(rs.rand(2, S, h, w, 512).astype(np.float32)).astype(jnp.bfloat16)
        qk = jnp.asarray(rs.rand(2, h, w, 128).astype(np.float32)).astype(jnp.bfloat16)
        qv = jnp.asarray(rs.rand(2, h, w, 512).astype(np.float32)).astype(jnp.bfloat16)
        sv = jnp.ones((2, S), bool)
        from rmnet_tpu.models.rmnet import memory_read

        timed("memory_read dense (S=12)",
              lambda k: memory_read(k, mv, qk, qv, sv)[0], mk)


if __name__ == "__main__":
    main()


def flash_probe():
    """Compile-time + run-time probe of the Pallas flash read.

    Measures, at 480p geometry (h=30, w=54) for S in {8, 24, 40} valid
    slots: dense XLA read; flash without bboxes (slot-validity sparsity
    only); flash with realistic object boxes (~1/3 of the frame: the
    block-sparse case — only in-box tiles are visited); and flash with the
    bank PADDED to the 32/64-slot capacity bucket (what serving runs —
    pad tiles are skipped, so time should track the valid-slot count, not
    the padded size, and every bucket shares one compile per geometry)."""
    import time
    import jax
    import jax.numpy as jnp
    from rmnet_tpu.ops.flash_attention import memory_read_flash

    rs = np.random.RandomState(0)
    N, h, w = 2, 30, 54

    def boxed(S):
        mk = rs.rand(N, S, h, w, 128).astype(np.float32)
        mv = rs.rand(N, S, h, w, 512).astype(np.float32)
        boxes = np.zeros((N, S, 4), np.int32)
        for n in range(N):
            for s in range(S):
                y0 = rs.randint(0, h * 16 // 2)
                x0 = rs.randint(0, w * 16 // 2)
                boxes[n, s] = (x0, x0 + w * 16 // 3, y0, y0 + h * 16 // 3)
                ys = (np.arange(h) * 16 >= y0) & (np.arange(h) * 16 <= y0 + h * 16 // 3)
                xs = (np.arange(w) * 16 >= x0) & (np.arange(w) * 16 <= x0 + w * 16 // 3)
                cell = ys[:, None] & xs[None]
                mk[n, s] *= cell[..., None]
                mv[n, s] *= cell[..., None]
        return (jnp.asarray(mk).astype(jnp.bfloat16),
                jnp.asarray(mv).astype(jnp.bfloat16), jnp.asarray(boxes))

    qk = jnp.asarray(rs.rand(N, h, w, 128).astype(np.float32)).astype(jnp.bfloat16)
    qv = jnp.asarray(rs.rand(N, h, w, 512).astype(np.float32)).astype(jnp.bfloat16)

    from rmnet_tpu.models.rmnet import memory_read

    for S in (8, 24, 40):
        mk, mv, boxes = boxed(S)
        sv = jnp.ones((N, S), bool)
        t0 = time.time()
        out = jax.jit(lambda a: memory_read_flash(a, mv, qk, qv, sv)[0])(mk)
        np.asarray(out.ravel()[:1])
        print(f"flash S={S}: compile+first {time.time() - t0:.1f} s", flush=True)
        timed(f"dense read S={S}",
              lambda a: memory_read(a, mv, qk, qv, sv)[0], mk, n=30)
        timed(f"flash read S={S} (no boxes)",
              lambda a: memory_read_flash(a, mv, qk, qv, sv)[0], mk, n=30)
        timed(f"flash read S={S} (boxes)",
              lambda a: memory_read_flash(a, mv, qk, qv, sv, bboxes=boxes)[0],
              mk, n=30)
        # serving shape: padded to the capacity bucket, tail slots invalid
        Sp = 32 if S <= 32 else 64
        pad = ((0, 0), (0, Sp - S), (0, 0), (0, 0), (0, 0))
        mk_p = jnp.pad(mk, pad)
        mv_p = jnp.pad(mv, pad)
        sv_p = jnp.asarray(np.pad(np.ones((N, S), bool), ((0, 0), (0, Sp - S))))
        boxes_p = jnp.pad(boxes, ((0, 0), (0, Sp - S), (0, 0)))
        timed(f"flash read S={S} (boxes, padded to {Sp})",
              lambda a: memory_read_flash(a, mv_p, qk, qv, sv_p, bboxes=boxes_p)[0],
              mk_p, n=30)


if __name__ == "__main__" and "flash" in sys.argv:
    flash_probe()
