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
    """Compile-time + run-time probe of the Pallas flash read at large S
    (auto-capacity engages it for long videos; a pathological compile here
    would stall real evals)."""
    import time
    import jax
    import jax.numpy as jnp
    from rmnet_tpu.ops.flash_attention import memory_read_flash

    rs = np.random.RandomState(0)
    for S in (24, 40):
        mk = jnp.asarray(rs.rand(2, S, 30, 54, 128).astype(np.float32)).astype(jnp.bfloat16)
        mv = jnp.asarray(rs.rand(2, S, 30, 54, 512).astype(np.float32)).astype(jnp.bfloat16)
        qk = jnp.asarray(rs.rand(2, 30, 54, 128).astype(np.float32)).astype(jnp.bfloat16)
        qv = jnp.asarray(rs.rand(2, 30, 54, 512).astype(np.float32)).astype(jnp.bfloat16)
        sv = jnp.ones((2, S), bool)
        fn = jax.jit(lambda a: memory_read_flash(a, mv, qk, qv, sv)[0])
        t0 = time.time()
        out = fn(mk)
        np.asarray(out.ravel()[:1])
        compile_s = time.time() - t0
        print(f"flash S={S}: compile+first {compile_s:.1f} s", flush=True)
        timed(f"flash read S={S}", lambda a: memory_read_flash(a, mv, qk, qv, sv)[0], mk, n=30)
        from rmnet_tpu.models.rmnet import memory_read
        timed(f"dense read S={S}", lambda a: memory_read(a, mv, qk, qv, sv)[0], mk, n=30)


if __name__ == "__main__" and "flash" in sys.argv:
    flash_probe()
