"""Layer-by-layer parity: flax modules (with imported torch weights) vs the
torch golden spec in tests/torch_ref.py. Small spatial sizes keep CPU compile
times sane; channel widths are the real ones so weight import is exercised
at full fidelity."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from rmnet_tpu.models.rmnet import (
    RMNet,
    Decoder,
    KeyValue,
    ResBlock,
    EncoderMemory,
    EncoderQuery,
    memory_read,
)
from rmnet_tpu.models.tiny_flownet import TinyFlowNet
from rmnet_tpu.models.torch_import import import_state_dict

from tests import torch_ref as TR

TOL = dict(rtol=2e-4, atol=2e-4)


def to_nhwc(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def from_nhwc(a):
    return np.asarray(a).transpose(0, 3, 1, 2)


def import_into(flax_model, torch_model, example_args, trunk_names="reference"):
    variables = flax_model.init(jax.random.PRNGKey(0), *example_args)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    variables = {k: dict(v) for k, v in variables.items()}  # mutable copy
    filled, missing = import_state_dict(variables, torch_model.state_dict(), trunk_names)
    assert not missing, f"missing keys: {missing}"
    return filled


def test_resblock_parity():
    t = TR.ResBlockT(256, 256).eval()
    j = ResBlock(256)
    x = torch.randn(2, 256, 9, 11)
    vars_ = import_into(j, t, (to_nhwc(x),))
    out_j = j.apply(vars_, to_nhwc(x))
    np.testing.assert_allclose(from_nhwc(out_j), t(x).detach().numpy(), **TOL)


def test_resblock_downsample_parity():
    t = TR.ResBlockT(64, 128, stride=2).eval()
    j = ResBlock(128, stride=2, downsample=True)
    x = torch.randn(1, 64, 12, 10)
    vars_ = import_into(j, t, (to_nhwc(x),))
    out_j = j.apply(vars_, to_nhwc(x))
    np.testing.assert_allclose(from_nhwc(out_j), t(x).detach().numpy(), **TOL)


def test_keyvalue_parity():
    t = TR.KeyValueT().eval()
    j = KeyValue(128, 512)
    x = torch.randn(2, 1024, 5, 7)
    vars_ = import_into(j, t, (to_nhwc(x),))
    k_j, v_j = j.apply(vars_, to_nhwc(x))
    k_t, v_t = t(x)
    np.testing.assert_allclose(from_nhwc(k_j), k_t.detach().numpy(), **TOL)
    np.testing.assert_allclose(from_nhwc(v_j), v_t.detach().numpy(), **TOL)


def test_decoder_parity():
    t = TR.DecoderT(256).eval()
    j = Decoder(256)
    r4 = torch.randn(2, 1024, 4, 5)
    r3 = torch.randn(2, 512, 8, 10)
    r2 = torch.randn(2, 256, 16, 20)
    vars_ = import_into(j, t, (to_nhwc(r4), to_nhwc(r3), to_nhwc(r2)))
    out_j = j.apply(vars_, to_nhwc(r4), to_nhwc(r3), to_nhwc(r2))
    np.testing.assert_allclose(from_nhwc(out_j), t(r4, r3, r2).detach().numpy(), **TOL)


def test_encoder_query_parity():
    t = TR.EncoderQueryT().eval()
    # randomize BN running stats so frozen-BN parity is actually tested
    for m in t.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
    j = EncoderQuery()
    f = torch.randn(1, 3, 64, 48)
    vars_ = import_into(j, t, (to_nhwc(f),))
    r4_j, r3_j, r2_j = j.apply(vars_, to_nhwc(f))
    r4_t, r3_t, r2_t, _, _ = t(f)
    np.testing.assert_allclose(from_nhwc(r4_j), r4_t.detach().numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(from_nhwc(r3_j), r3_t.detach().numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(from_nhwc(r2_j), r2_t.detach().numpy(), rtol=1e-3, atol=1e-3)


def test_encoder_memory_parity():
    t = TR.EncoderMemoryT().eval()
    j = EncoderMemory()
    f = torch.randn(1, 3, 48, 64)
    m = torch.rand(1, 48, 64)
    o = torch.rand(1, 48, 64)
    vars_ = import_into(j, t, (to_nhwc(f), jnp.asarray(m.numpy()), jnp.asarray(o.numpy())))
    r4_j = j.apply(vars_, to_nhwc(f), jnp.asarray(m.numpy()), jnp.asarray(o.numpy()))
    r4_t = t(f, m, o)[0]
    np.testing.assert_allclose(from_nhwc(r4_j), r4_t.detach().numpy(), rtol=1e-3, atol=1e-3)


def test_memory_read_parity():
    rs = np.random.RandomState(0)
    N, S, h, w, Ck, Cv = 3, 2, 4, 5, 128, 512
    mk = rs.randn(N, Ck, S, h, w).astype(np.float32)
    mv = rs.randn(N, Cv, S, h, w).astype(np.float32)
    qk = rs.randn(N, Ck, h, w).astype(np.float32)
    qv = rs.randn(N, Cv, h, w).astype(np.float32)
    out_t, p_t = TR.memory_read_t(
        torch.from_numpy(mk), torch.from_numpy(mv), torch.from_numpy(qk), torch.from_numpy(qv)
    )
    out_j, p_j = memory_read(
        jnp.asarray(mk.transpose(0, 2, 3, 4, 1)),
        jnp.asarray(mv.transpose(0, 2, 3, 4, 1)),
        jnp.asarray(qk.transpose(0, 2, 3, 1)),
        jnp.asarray(qv.transpose(0, 2, 3, 1)),
        jnp.ones((N, S), bool),
    )
    np.testing.assert_allclose(from_nhwc(out_j), out_t.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(p_j), p_t.numpy(), rtol=1e-3, atol=1e-5)


def test_memory_read_invalid_slots_equal_smaller_bank():
    """A bank with invalid slots must equal the bank without them."""
    rs = np.random.RandomState(1)
    N, S, h, w, Ck, Cv = 2, 3, 3, 4, 16, 8
    mk = rs.randn(N, S, h, w, Ck).astype(np.float32)
    mv = rs.randn(N, S, h, w, Cv).astype(np.float32)
    qk = rs.randn(N, h, w, Ck).astype(np.float32)
    qv = rs.randn(N, h, w, Cv).astype(np.float32)
    valid = np.array([[True, True, False], [True, True, False]])
    out_masked, _ = memory_read(
        jnp.asarray(mk), jnp.asarray(mv), jnp.asarray(qk), jnp.asarray(qv), jnp.asarray(valid)
    )
    out_small, _ = memory_read(
        jnp.asarray(mk[:, :2]), jnp.asarray(mv[:, :2]), jnp.asarray(qk), jnp.asarray(qv),
        jnp.ones((N, 2), bool),
    )
    np.testing.assert_allclose(np.asarray(out_masked), np.asarray(out_small), rtol=1e-5, atol=1e-6)


def test_tiny_flownet_parity():
    t = TR.TinyFlowNetT().eval()
    j = TinyFlowNet()
    frames = torch.randn(1, 3, 3, 64, 64)  # (B, T, C, H, W)
    frames_j = jnp.asarray(frames.numpy().transpose(0, 1, 3, 4, 2))
    vars_ = import_into(j, t, (frames_j,))
    flows_j = j.apply(vars_, frames_j)  # (B, T, H, W, 2)
    with torch.no_grad():
        f1 = t.pair(frames[:, 1], frames[:, 0], TR.pad_divide_by_t)
        f2 = t.pair(frames[:, 2], frames[:, 1], TR.pad_divide_by_t)
    np.testing.assert_allclose(np.asarray(flows_j[:, 0]), 0.0)
    np.testing.assert_allclose(
        np.asarray(flows_j[:, 1]).transpose(0, 3, 1, 2), f1.numpy(), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(flows_j[:, 2]).transpose(0, 3, 1, 2), f2.numpy(), rtol=1e-3, atol=1e-3
    )
