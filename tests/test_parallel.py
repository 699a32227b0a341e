"""Mesh/sharding/farm tests on the 8-device virtual CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from rmnet_tpu.parallel import make_mesh, shard_batch, DeviceFarm


def test_mesh_and_shard_batch():
    assert len(jax.devices()) == 8, "conftest must force 8 virtual devices"
    mesh = make_mesh(8)
    batch = {"x": np.arange(16, dtype=np.float32).reshape(8, 2)}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding.num_devices == 8

    @jax.jit
    def mean(b):
        return jnp.mean(b["x"])

    np.testing.assert_allclose(float(mean(sharded)), batch["x"].mean())


def test_data_parallel_grad_matches_single_device():
    """Sharded-batch gradient == single-device gradient (GSPMD all-reduce)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(4)
    w = jnp.asarray(np.random.RandomState(0).rand(3, 3).astype(np.float32))
    x = np.random.RandomState(1).rand(8, 3).astype(np.float32)

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g_single = jax.grad(loss)(w, jnp.asarray(x))
    x_sharded = jax.device_put(x, NamedSharding(mesh, P("data")))
    w_repl = jax.device_put(w, NamedSharding(mesh, P()))
    g_sharded = jax.jit(jax.grad(loss))(w_repl, x_sharded)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_single), rtol=1e-5)


def test_device_farm_order_and_errors():
    def work(device, replica, item):
        if item == 3:
            raise RuntimeError("bad video")
        return float(jax.device_put(jnp.asarray(item * 2.0), device))

    farm = DeviceFarm(work, variables={"w": jnp.ones(2)})
    out = farm.map(list(range(6)))
    assert out[3] is None  # skip-on-error like the reference eval server
    assert out[:3] == [0.0, 2.0, 4.0] and out[4:] == [8.0, 10.0]


def test_spatial_partition_matches_single_device():
    """Width-sharded inference must match the single-device forward exactly
    (one logical GSPMD program: halo exchanges + collective reductions are
    XLA's problem, not the model's) — latency scaling beyond the
    reference's batch-only DataParallel."""
    import jax.numpy as jnp

    from rmnet_tpu.parallel import make_mesh
    from rmnet_tpu.parallel.mesh import spatial_forward_video
    from tests.test_rmnet_forward import build_clip, LOOSE
    from rmnet_tpu.config import Config
    from rmnet_tpu.core.engine import build_models
    from rmnet_tpu.models.rmnet import RMNetApply

    frames, masks, flows, n_objects = build_clip()
    cfg = Config()
    _, _, rm_vars, _ = build_models(cfg, 0)
    apply = RMNetApply(build_models(cfg, 0)[0], memorize_every=1,
                       n_bbox_loose_pixels=LOOSE)

    ref = np.asarray(jax.jit(apply.forward_video)(
        rm_vars, jnp.asarray(frames), jnp.asarray(masks),
        jnp.asarray(flows), jnp.asarray(n_objects),
    ))
    mesh = make_mesh(4, axis_name="space")
    out = np.asarray(spatial_forward_video(
        apply, rm_vars, jnp.asarray(frames), jnp.asarray(masks),
        jnp.asarray(flows), jnp.asarray(n_objects), mesh=mesh,
    ))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    # repeated serving calls reuse ONE cached jitted program per
    # (apply, mesh) — no per-call retrace
    from rmnet_tpu.parallel import mesh as mesh_mod

    n_cached = len(mesh_mod._SPATIAL_FNS)
    out2 = np.asarray(spatial_forward_video(
        apply, rm_vars, jnp.asarray(frames), jnp.asarray(masks),
        jnp.asarray(flows), jnp.asarray(n_objects), mesh=mesh,
    ))
    assert len(mesh_mod._SPATIAL_FNS) == n_cached
    np.testing.assert_array_equal(out2, out)


def test_hybrid_dp_sp_train_gradient_matches_single_device():
    """Hybrid batch x width training (2x2 'data' x 'space' mesh): the
    UNMODIFIED train-loss gradient with batch sharded over 'data' and frame
    width over 'space' must match single-device. Extends spatial
    partitioning from forward/eval into training — the config for
    high-resolution fine-tuning where the per-chip batch share would drop
    below one (beyond the reference's batch-only DataParallel)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rmnet_tpu.config import Config
    from rmnet_tpu.core.engine import build_models
    from rmnet_tpu.core.train import make_loss_fn
    from rmnet_tpu.models.rmnet import RMNetApply
    from rmnet_tpu.parallel import make_hybrid_mesh, hybrid_shard_batch

    B, T, K, H, W = 4, 2, 3, 48, 64
    rs = np.random.RandomState(0)
    labels = np.zeros((B, T, H, W), np.uint8)
    labels[:, :, 8:28, 10:30] = 1
    labels[:, :, 30:44, 36:58] = 2
    batch = {
        "frames": rs.rand(B, T, H, W, 3).astype(np.float32) * 2 - 1,
        "masks": np.stack([(labels == k) for k in range(K)], 2).astype(
            np.float32),
        "flows": (rs.rand(B, T, H, W, 2).astype(np.float32) - 0.5) * 4,
        "n_objects": np.full((B, T), K - 1, np.int32),
    }

    cfg = Config()
    cfg.TRAIN.NETWORK = "RMNet"
    rmnet, tflownet, rm_vars, _ = build_models(cfg, 0)
    apply = RMNetApply(rmnet, memorize_every=cfg.TRAIN.MEMORIZE_EVERY)
    loss_fn = make_loss_fn(cfg, apply, tflownet, remat="encoders")
    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

    params = rm_vars["params"]
    extra = {k: v for k, v in rm_vars.items() if k != "params"}
    dev0 = jax.devices()[0]
    (loss1, _), g1 = grad_fn(
        jax.device_put(params, dev0), jax.device_put(extra, dev0),
        {k: jax.device_put(v, dev0) for k, v in batch.items()},
    )
    g1 = jax.tree_util.tree_map(np.asarray, g1)

    mesh = make_hybrid_mesh(2, 2)
    repl = NamedSharding(mesh, P())
    sharded = hybrid_shard_batch(batch, mesh)
    # every batch array really is split over BOTH axes
    assert sharded["frames"].sharding.num_devices == 4
    (loss4, _), g4 = grad_fn(
        jax.device_put(params, repl), jax.device_put(extra, repl), sharded
    )
    np.testing.assert_allclose(float(loss4), float(loss1), rtol=5e-5)

    flat1 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(g1)}
    flat4 = {jax.tree_util.keystr(k): np.asarray(v)
             for k, v in jax.tree_util.tree_leaves_with_path(g4)}
    gmax = max(np.abs(v).max() for v in flat1.values())
    assert gmax > 0
    bad = [
        (n, float(np.linalg.norm(flat4[n] - flat1[n])
                  / (np.linalg.norm(flat1[n]) + 1e-30)))
        for n in sorted(flat1)
        if np.linalg.norm(flat4[n] - flat1[n])
        > 5e-4 * np.linalg.norm(flat1[n])
        and np.abs(flat4[n] - flat1[n]).max() > 1e-6 * gmax
    ]
    assert not bad, f"{len(bad)} tensors off: {bad[:10]}"
