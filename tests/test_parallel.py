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
