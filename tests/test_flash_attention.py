"""Pallas flash memory-read vs the XLA reference path (interpret mode on CPU)."""

import numpy as np

import jax.numpy as jnp

from rmnet_tpu.models.rmnet import memory_read
from rmnet_tpu.ops.flash_attention import memory_read_flash


def _case(N, S, h, w, Ck, Cv, seed, invalidate=True):
    rs = np.random.RandomState(seed)
    mk = rs.randn(N, S, h, w, Ck).astype(np.float32)
    mv = rs.randn(N, S, h, w, Cv).astype(np.float32)
    qk = rs.randn(N, h, w, Ck).astype(np.float32)
    qv = rs.randn(N, h, w, Cv).astype(np.float32)
    valid = np.ones((N, S), bool)
    if invalidate and S > 1:
        valid[:, -1] = False
        valid[0, 0] = False if N > 1 else valid[0, 0]
    # regional masking: zero out some key/value positions of valid slots
    mk[:, :, : h // 2] = 0.0
    mv[:, :, : h // 2] = 0.0
    return mk, mv, qk, qv, valid


def test_flash_matches_xla():
    mk, mv, qk, qv, valid = _case(2, 3, 8, 16, 128, 512, 0)
    out_ref, _ = memory_read(
        jnp.asarray(mk), jnp.asarray(mv), jnp.asarray(qk), jnp.asarray(qv),
        jnp.asarray(valid),
    )
    out_flash, _ = memory_read_flash(
        jnp.asarray(mk), jnp.asarray(mv), jnp.asarray(qk), jnp.asarray(qv),
        jnp.asarray(valid), interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_ref), rtol=2e-4, atol=2e-4
    )


def test_flash_unaligned_sizes():
    # h*w = 30*54 = 1620: not a multiple of the 512 memory tile; Q padding too
    mk, mv, qk, qv, valid = _case(1, 2, 6, 10, 128, 512, 1)
    out_ref, _ = memory_read(
        jnp.asarray(mk), jnp.asarray(mv), jnp.asarray(qk), jnp.asarray(qv),
        jnp.asarray(valid),
    )
    out_flash, _ = memory_read_flash(
        jnp.asarray(mk), jnp.asarray(mv), jnp.asarray(qk), jnp.asarray(qv),
        jnp.asarray(valid), interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_ref), rtol=2e-4, atol=2e-4
    )


def test_flash_zero_query_uniform():
    """Regionally-masked-out queries (all-zero q rows) must average the
    valid-slot values — the reference's intended semantics."""
    mk, mv, qk, qv, valid = _case(1, 2, 4, 8, 128, 64, 2, invalidate=False)
    qk[:] = 0.0
    out_flash, _ = memory_read_flash(
        jnp.asarray(mk), jnp.asarray(mv), jnp.asarray(qk), jnp.asarray(qv),
        jnp.asarray(valid), interpret=True,
    )
    mem = np.asarray(out_flash)[..., :64]
    expected = mv.reshape(1, -1, 64).mean(axis=1)  # uniform over all positions
    np.testing.assert_allclose(mem[0, 0, 0], expected[0], rtol=1e-4, atol=1e-5)
