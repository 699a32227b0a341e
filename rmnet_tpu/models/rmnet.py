"""RMNet: regional space-time-memory network for semi-supervised VOS.

TPU-native redesign of the reference models/rmnet.py (same capabilities,
different architecture of the computation):

  * The reference builds ragged per-object batches in Python loops
    (models/rmnet.py:219-229, 327-349); here the object axis is a *static*
    ``K`` with (B, K) validity masks, vmapped/reshaped into the batch.
  * The reference grows its memory bank with ``torch.cat`` along time
    (models/rmnet.py:420-422); here the bank is a fixed-capacity buffer with
    a write cursor and slot-validity mask, carried through ``jax.lax.scan``
    (training) or a jitted streaming step (inference). Invalid slots get
    ``-inf`` attention scores and thus exactly zero probability, so the
    softmax semantics match a bank that only contains real entries.
  * The "always include the previous frame even if not committed" rule
    (models/rmnet.py:416-422) becomes one extra ephemeral slot appended to
    the bank view used by attention.
  * Regional masking multiplies keys/values by the /16 attention map exactly
    as the reference (models/rmnet.py:243-248, 355-358); masked-out *valid*
    positions keep score 0 and still take softmax mass — intentional
    reference semantics, preserved.

Magic constants 32.0605 / -16.1181 (models/rmnet.py:442-448) equal
``log(eps/(1-eps))`` for the aggregation clamp eps=1e-7 — see
rmnet_tpu/ops/aggregation.py.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rmnet_tpu.nn import BatchNorm2d, Conv2d
from rmnet_tpu.nn.layers import kaiming_normal_conv_init, torch_default_conv_init
from rmnet_tpu.models.resnet import ResNet50Trunk
from rmnet_tpu.ops import (
    pad_divide_by,
    unpad,
    regional_attention_map,
    regional_attention_small,
    resize_bilinear,
    soft_aggregation,
    backward_warp,
)
from rmnet_tpu.ops.warp import backward_warp_fast, backward_warp_quantized
from rmnet_tpu.ops.pad import divide_pads

NEW_OBJECT_SCALE = 32.0605
NEW_OBJECT_BIAS = -16.1181
SUPPRESSED = -16.1181


def _present_objects(one_hot: jnp.ndarray) -> jnp.ndarray:
    """(B, K) presence flags: which slots the argmax label map contains.

    Equivalent to ``bincount(argmax(one_hot)) > 0`` for disjoint one-hot
    masks — but as pure max-reductions instead of a scatter (bincount's
    scatter-add costs milliseconds per frame on TPU). Slot k>=1 is present
    iff its channel fires anywhere; slot 0 is the argmax wherever no k>=1
    channel fires (covers both bg=1 and all-zero/ignored pixels).
    """
    fg = one_hot[:, 1:] >= 0.5  # (B, K-1, H, W)
    present_fg = jnp.any(fg, axis=(2, 3))
    present_bg = jnp.any(~jnp.any(fg, axis=1), axis=(1, 2))
    return jnp.concatenate([present_bg[:, None], present_fg], axis=1)


class ResBlock(nn.Module):
    """2x 3x3-conv residual block (reference models/rmnet.py:24-48)."""

    outdim: int
    stride: int = 1
    downsample: bool = False
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.conv1 = Conv2d(
            self.outdim, (3, 3), stride=(self.stride, self.stride), padding=(1, 1),
            kernel_init=kaiming_normal_conv_init, dtype=self.dtype,
        )
        self.conv2 = Conv2d(
            self.outdim, (3, 3), padding=(1, 1),
            kernel_init=kaiming_normal_conv_init, dtype=self.dtype,
        )
        if self.downsample:
            self.downsample_conv = Conv2d(
                self.outdim, (3, 3), stride=(self.stride, self.stride), padding=(1, 1),
                kernel_init=kaiming_normal_conv_init, dtype=self.dtype,
            )

    def __call__(self, x):
        r = self.conv1(nn.relu(x))
        r = self.conv2(nn.relu(r))
        if self.downsample:
            x = self.downsample_conv(x)
        return x + r


class EncoderMemory(nn.Module):
    """ResNet-50 trunk + mask/other-mask stems (reference models/rmnet.py:51-80)."""

    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.conv1_m = Conv2d(
            64, (7, 7), stride=(2, 2), padding=(3, 3), use_bias=False,
            kernel_init=torch_default_conv_init, dtype=self.dtype,
        )
        self.conv1_o = Conv2d(
            64, (7, 7), stride=(2, 2), padding=(3, 3), use_bias=False,
            kernel_init=torch_default_conv_init, dtype=self.dtype,
        )
        self.trunk = ResNet50Trunk(dtype=self.dtype)

    def __call__(self, f, m, o, train_bn: bool = False):
        """f: (B, H, W, 3); m, o: (B, H, W) -> r4 (B, H/16, W/16, 1024)."""
        extra = self.conv1_m(m[..., None]) + self.conv1_o(o[..., None])
        r4, _, _, _ = self.trunk(f, extra_stem=extra, train_bn=train_bn)
        return r4

    def shared(self, f, m_bk, o_bk, train_bn: bool = False):
        """Per-object encode with the three 7x7 stems MERGED into one conv.

        f: (B, H, W, 3); m_bk, o_bk: (B*Ko, H, W) per-object batches (object
        folded into batch, B-major). ``conv1(f) + conv1_m(m) + conv1_o(o)``
        is one 5-channel conv with the kernels concatenated on the input
        axis — exactly the reference's summed stems (models/rmnet.py:73-75).
        Small-input-channel 7x7/s2 convs are latency-bound on TPU (~1.3 ms
        each at 480p regardless of C, round-2 micro-bench), so one 5-channel
        conv replaces three convs at a third of the wall time even though it
        recomputes the RGB term per object.
        """
        B = f.shape[0]
        Ko = m_bk.shape[0] // B
        f_bk = jnp.broadcast_to(f[:, None], (B, Ko) + f.shape[1:]).reshape(
            (B * Ko,) + f.shape[1:]
        )
        x5 = jnp.concatenate([f_bk, m_bk[..., None], o_bk[..., None]], axis=-1)
        wf = self.trunk.conv1.variables["params"]["weight"]
        wm = self.conv1_m.variables["params"]["weight"]
        wo = self.conv1_o.variables["params"]["weight"]
        w5 = jnp.concatenate([wf, wm, wo], axis=2)  # (7, 7, 5, 64) HWIO
        dt = self.trunk.conv1.dtype or x5.dtype
        c1 = jax.lax.conv_general_dilated(
            x5.astype(dt), w5.astype(dt),
            window_strides=(2, 2), padding=[(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        r4, _, _, _ = self.trunk(None, train_bn=train_bn, conv1_out=c1)
        return r4


class EncoderQuery(nn.Module):
    """RGB-only ResNet-50 trunk (reference models/rmnet.py:83-104)."""

    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.trunk = ResNet50Trunk(dtype=self.dtype)

    def __call__(self, f, train_bn: bool = False):
        r4, r3, r2, _ = self.trunk(f, train_bn=train_bn)
        return r4, r3, r2


class KeyValue(nn.Module):
    """Parallel 3x3 key/value heads (reference models/rmnet.py:168-176)."""

    keydim: int = 128
    valdim: int = 512
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.key_conv = Conv2d(
            self.keydim, (3, 3), padding=(1, 1),
            kernel_init=kaiming_normal_conv_init, dtype=self.dtype,
        )
        self.value_conv = Conv2d(
            self.valdim, (3, 3), padding=(1, 1),
            kernel_init=kaiming_normal_conv_init, dtype=self.dtype,
        )

    def __call__(self, x):
        return self.key_conv(x), self.value_conv(x)


class Refine(nn.Module):
    """Decoder refinement block (reference models/rmnet.py:107-120)."""

    planes: int
    scale_factor: int = 2
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.convFS = Conv2d(
            self.planes, (3, 3), padding=(1, 1),
            kernel_init=kaiming_normal_conv_init, dtype=self.dtype,
        )
        self.ResFS = ResBlock(self.planes, dtype=self.dtype)
        self.ResMM = ResBlock(self.planes, dtype=self.dtype)

    def skip(self, f):
        """Skip-feature branch — depends only on the shared encoder feature,
        so the caller can compute it once per frame and broadcast it across
        objects (the reference recomputes it per object,
        models/rmnet.py:332-335 + 114-118)."""
        return self.ResFS(self.convFS(f))

    def fuse(self, s, pm):
        up_hw = (pm.shape[-3] * self.scale_factor, pm.shape[-2] * self.scale_factor)
        return self.ResMM(s + resize_bilinear(pm, up_hw, align_corners=False))

    def __call__(self, f, pm):
        return self.fuse(self.skip(f), pm)


class Decoder(nn.Module):
    """1024 -> 2-logit decoder with skip refinement (reference models/rmnet.py:123-140)."""

    mdim: int = 256
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.convFM = Conv2d(
            self.mdim, (3, 3), padding=(1, 1),
            kernel_init=kaiming_normal_conv_init, dtype=self.dtype,
        )
        self.ResMM = ResBlock(self.mdim, dtype=self.dtype)
        self.RF3 = Refine(self.mdim, dtype=self.dtype)
        self.RF2 = Refine(self.mdim, dtype=self.dtype)
        self.pred2 = Conv2d(
            2, (3, 3), padding=(1, 1),
            kernel_init=kaiming_normal_conv_init, dtype=self.dtype,
        )

    def skips(self, r3, r2):
        """Per-frame skip features (object-independent half of the decoder)."""
        return self.RF3.skip(r3), self.RF2.skip(r2)

    def from_skips(self, r4, s3, s2):
        """Per-object half: r4 is the memory-read output, s3/s2 precomputed."""
        m4 = self.ResMM(self.convFM(r4))
        m3 = self.RF3.fuse(s3, m4)
        m2 = self.RF2.fuse(s2, m3)
        p2 = self.pred2(nn.relu(m2))
        out_hw = (p2.shape[-3] * 4, p2.shape[-2] * 4)
        return resize_bilinear(p2, out_hw, align_corners=False)

    def __call__(self, r4, r3, r2):
        s3, s2 = self.skips(r3, r2)
        return self.from_skips(r4, s3, s2)


def memory_read(
    m_key: jnp.ndarray,
    m_val: jnp.ndarray,
    q_key: jnp.ndarray,
    q_val: jnp.ndarray,
    slot_valid: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Space-time memory read (reference MemoryReader, models/rmnet.py:143-165).

    Args:
      m_key: (N, S, h, w, Ck) memory keys (N = B*K flattened object batch).
      m_val: (N, S, h, w, Cv) memory values.
      q_key: (N, h, w, Ck) query keys.
      q_val: (N, h, w, Cv) query values.
      slot_valid: (N, S) bool; invalid slots get -inf scores (exactly zero
        probability), making the fixed-capacity bank equivalent to the
        reference's grown bank.

    Returns:
      (mem_val, p): (N, h, w, Ck+... = Cv*2) read result concat q_val, and
      the (N, S*h*w, h*w) affinity (reference returns it for visualization).
    """
    N, S, h, w, Ck = m_key.shape
    Cv = m_val.shape[-1]
    hw = h * w

    mk = m_key.reshape(N, S * hw, Ck)
    qk = q_key.reshape(N, hw, Ck)
    scores = jnp.einsum("nmc,nqc->nmq", mk, qk, preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(Ck)
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    valid = jnp.repeat(slot_valid, hw, axis=1)  # (N, S*hw)
    scores = jnp.where(valid[..., None], scores, neg_inf)
    p = jax.nn.softmax(scores, axis=1)  # (N, S*hw, hw)

    mv = m_val.reshape(N, S * hw, Cv)
    mem = jnp.einsum("nmq,nmv->nqv", p.astype(m_val.dtype), mv,
                     preferred_element_type=jnp.float32)
    mem = mem.reshape(N, h, w, Cv).astype(q_val.dtype)
    return jnp.concatenate([mem, q_val], axis=-1), p


class RMNet(nn.Module):
    """Parameter container for all RMNet sub-networks.

    The per-frame control flow lives in :class:`RMNetApply` — keeping the
    linen module a pure function library makes scan/jit orchestration and
    parameter surgery (torch import, partial init) straightforward.
    """

    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.encoder_memory = EncoderMemory(dtype=self.dtype)
        self.encoder_query = EncoderQuery(dtype=self.dtype)
        self.kv_memory = KeyValue(128, 512, dtype=self.dtype)
        self.kv_query = KeyValue(128, 512, dtype=self.dtype)
        self.decoder = Decoder(256, dtype=self.dtype)

    def encode_memory(self, f, m, o, train_bn: bool = False):
        r4 = self.encoder_memory(f, m, o, train_bn)
        return self.kv_memory(r4)

    def encode_memory_shared(self, f, m_bk, o_bk, train_bn: bool = False):
        """Per-object memory encode with the RGB stem shared across objects."""
        r4 = self.encoder_memory.shared(f, m_bk, o_bk, train_bn)
        return self.kv_memory(r4)

    def encode_query(self, f, train_bn: bool = False):
        r4, r3, r2 = self.encoder_query(f, train_bn)
        k4, v4 = self.kv_query(r4)
        return k4, v4, r3, r2

    def decode(self, m4, r3, r2):
        return self.decoder(m4, r3, r2)

    def decode_skips(self, r3, r2):
        return self.decoder.skips(r3, r2)

    def decode_from_skips(self, m4, s3, s2):
        return self.decoder.from_skips(m4, s3, s2)

    def __call__(self, f, m, o, train_bn: bool = False):
        """Init-only entry touching every submodule so ``init`` builds all params."""
        k4m, v4m = self.encode_memory(f, m, o, train_bn)
        k4q, v4q, r3, r2 = self.encode_query(f, train_bn)
        m4 = jnp.concatenate([v4q, v4q], axis=-1)
        logits = self.decode(m4, r3, r2)
        return k4m, v4m, k4q, logits


class MemoryBank(NamedTuple):
    """Fixed-capacity per-object memory bank (scan carry / streaming state)."""

    keys: jnp.ndarray    # (B, K, S, h, w, Ck)
    values: jnp.ndarray  # (B, K, S, h, w, Cv)
    bboxes: jnp.ndarray  # (B, K, S, 4) int32
    cursor: jnp.ndarray  # () int32 — number of committed slots; or (B,) when
    # every stream in the batch keeps its own commit schedule (ragged
    # multi-stream serving, init_state(per_stream_cursor=True))
    # NOTE: slot validity is derived: slot s valid iff s < cursor.


class VOSState(NamedTuple):
    """Streaming inference state carried across frames."""

    bank: MemoryBank
    prev_mask: jnp.ndarray  # (B, K, H, W) previous frame's estimated mask
    prev_frame: jnp.ndarray  # (B, H, W, 3)
    exist: jnp.ndarray  # (B, K) bool — objects revealed so far
    t: jnp.ndarray  # () int32 — current frame index


@dataclasses.dataclass(frozen=True)
class RMNetApply:
    """Functional orchestration of RMNet: memorize / segment / step / video.

    Mirrors the reference control flow (models/rmnet.py:191-452) with static
    shapes. ``model.apply`` is closed over ``variables`` by the caller.
    """

    model: RMNet
    memorize_every: int = 5
    prob_threshold: float = 0.5
    n_pts_threshold: int = 10
    n_bbox_loose_pixels: int = 64
    train_bn: bool = False
    # fused block-sparse Pallas memory read (differentiable: custom-VJP
    # flash backward, ops/flash_attention.py) — serving default on TPU,
    # opt-in for training via cfg.TRAIN.FLASH_ATTENTION
    use_flash_attention: bool = False
    # inference-only: skip warping the background channel in get_att_map.
    # The bbox generator ignores slot 0 (forward-identical), but training
    # MUST warp all K channels — the constant-ones straight-through att-map
    # gradient only cancels through the est-mask softmax when every channel
    # receives it (see get_att_map / tests/test_grad_semantics.py).
    skip_bg_warp: bool = False
    # serving-only: 1-gather u8-packed warp for the att-map (<=1/510 mask
    # quantization; the warped mask feeds only the 0.5-threshold bbox op).
    # Enabled by the engine for bf16 serving; f32 eval keeps exact taps.
    warp_u8: bool = False
    # rematerialize per scan step (training): keeps only the carry between
    # frames and recomputes within-step activations in the backward pass
    remat: bool = False
    # selective remat (training): recompute only the two ResNet-50 encoder
    # interiors in the backward pass — their internals are ~90% of saved
    # activations but only ~half the recompute FLOPs of a whole-step remat,
    # so this trades a little memory for one fewer full forward per frame
    remat_encoders: bool = False

    # ----------------------------------------------------------------- utils
    def _apply(self, variables, method, *args):
        kwargs = {}
        if method in ("encode_memory", "encode_memory_shared", "encode_query"):
            kwargs["train_bn"] = self.train_bn
            if self.train_bn:
                # trainable BN (reference core/train.py:59-66): batch stats
                # normalize, running stats update -> returned to the caller,
                # which threads them through the per-frame scan carry
                fn = functools.partial(
                    self.model.apply, method=method,
                    mutable=["batch_stats"], **kwargs,
                )
                if self.remat_encoders:
                    fn = jax.checkpoint(fn)
                out, mut = fn(variables, *args)
                return out, mut["batch_stats"]
            if self.remat_encoders:
                fn = functools.partial(self.model.apply, method=method, **kwargs)
                return jax.checkpoint(fn)(variables, *args)
        return self.model.apply(variables, *args, method=method, **kwargs)

    # ------------------------------------------------------------- memorize
    def memorize(
        self,
        variables: Dict[str, Any],
        frame: jnp.ndarray,   # (B, H, W, 3)
        masks: jnp.ndarray,   # (B, K, H, W) soft per-object masks
        obj_valid: jnp.ndarray,  # (B, K) bool, slot 0 False
    ):
        """Encode one frame into per-object regional keys/values.

        Returns (k4, v4, bboxes, bn): (B, K, h, w, Ck/Cv), (B, K, 4), and
        the updated batch_stats collection (None unless ``train_bn``).
        Replaces reference memorize + pad_memory (models/rmnet.py:191-250).
        """
        B, K, H, W = masks.shape
        (frame_p,), _ = pad_divide_by([frame], 16)
        (masks_p,), _ = pad_divide_by([masks], 16, spatial_axes=(-2, -1))
        Hp, Wp = frame_p.shape[1:3]

        v = obj_valid.astype(masks_p.dtype)[:, :, None, None]  # (B, K, 1, 1)
        masks_v = masks_p * v
        # other-objects mask: sum of all *valid* other object masks, clamped
        others = jnp.clip(
            jnp.sum(masks_v, axis=1, keepdims=True) - masks_v, 0.0, 1.0
        )  # (B, K, Hp, Wp)

        # fold object slots into the batch for the encoder (static-shape
        # per-object batch). Slot 0 (background) is never encoded — the
        # reference's pad_memory leaves it zero — so only K-1 slots run,
        # saving a full encoder pass per frame. The RGB conv1 stem is
        # object-independent and computed once (encode_memory_shared).
        Ko = K - 1
        m_bk = masks_p[:, 1:].reshape(B * Ko, Hp, Wp)
        o_bk = others[:, 1:].reshape(B * Ko, Hp, Wp)

        enc = self._apply(variables, "encode_memory_shared", frame_p, m_bk, o_bk)
        (k4, v4), bn = enc if self.train_bn else (enc, None)
        h, w = k4.shape[1:3]
        k4 = jnp.pad(k4.reshape(B, Ko, h, w, -1), ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
        v4 = jnp.pad(v4.reshape(B, Ko, h, w, -1), ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))

        # zero out background slot 0 and invalid objects (reference
        # pad_memory leaves those slots zero, models/rmnet.py:191-205)
        vk = obj_valid.astype(k4.dtype)[:, :, None, None, None]
        k4 = k4 * vk
        v4 = v4 * vk

        # regional memory embedding (models/rmnet.py:243-248); the
        # reference's F.interpolate(scale_factor=1/16) defaults to NEAREST —
        # rasterized directly on the /16 sample grid (bit-exact, skips the
        # full-res (B,K,H,W) map entirely)
        att_small, bboxes = regional_attention_small(
            masks_p, (h, w), (0, 0), 16,
            self.prob_threshold, self.n_pts_threshold, self.n_bbox_loose_pixels,
        )
        # cast the binary {0,1} map to the k/v compute dtype (exact): in
        # bf16 training the masks ride f32 and an f32 multiply here would
        # silently promote the whole memory-read chain to f32 MXU rate
        att_small = att_small.astype(k4.dtype)[..., None]  # (B, K, h, w, 1)
        k4 = k4 * att_small
        v4 = v4 * att_small
        return k4, v4, bboxes, bn

    # --------------------------------------------------------------- attmap
    def get_att_map(self, prev_mask: jnp.ndarray, flow: Optional[jnp.ndarray] = None):
        """Warp prev mask by flow (if given) then bbox-dilate
        (reference models/rmnet.py:280-287). prev_mask: (B, K, H, W);
        flow: (B, H, W, 2)."""
        if flow is None:
            expt = prev_mask
        else:
            B, K, H, W = prev_mask.shape
            # ALL K channels are warped even though slot 0 never reaches the
            # bbox generator: the att-map's constant-ones straight-through
            # gradient only cancels through the est-mask softmax when it hits
            # every channel uniformly (sum_k dp_k/dlogit_j = 0). Warping K-1
            # channels leaves a net bias that measurably anti-trains the
            # model (reference warps all K, models/rmnet.py:431).
            m_img = prev_mask.transpose(0, 2, 3, 1)  # (B, H, W, K)
            warped, _ = backward_warp(m_img, flow)
            expt = warped.transpose(0, 3, 1, 2)
        return regional_attention_map(
            expt, self.prob_threshold, self.n_pts_threshold, self.n_bbox_loose_pixels
        )

    def get_att_small(
        self,
        prev_mask: jnp.ndarray,                 # (B, K, H, W)
        flow: Optional[jnp.ndarray],            # (B, H, W, 2) or None
        out_hw: Tuple[int, int],
        offset: Tuple[int, int],
    ) -> jnp.ndarray:
        """``get_att_map`` fused to the /16 grid the consumers sample.

        Identical values to pad+nearest-/16 of ``get_att_map``'s full-res
        map (see ops/att_map.regional_attention_small). ``skip_bg_warp``
        drops the background channel from the warp gather at inference —
        slot 0 never reaches the bbox generator, so the output is unchanged.
        """
        # the packed fast warps are forward-only (bitcast kills the
        # cotangent) and gated behind the inference-only flags; the
        # training branch MUST keep the differentiable generic warp
        if self.warp_u8:
            warp_fn = backward_warp_quantized
        elif self.skip_bg_warp:
            warp_fn = backward_warp_fast
        else:
            warp_fn = backward_warp
        if flow is None:
            expt = prev_mask
        elif self.skip_bg_warp:
            m_img = prev_mask[:, 1:].transpose(0, 2, 3, 1)  # (B, H, W, K-1)
            warped, _ = warp_fn(m_img, flow)
            expt = jnp.concatenate(
                [jnp.zeros_like(prev_mask[:, :1]), warped.transpose(0, 3, 1, 2)], axis=1
            )
        elif self.warp_u8:
            # serving override without bg-skip: still honor the 1-gather
            # u8 sampler (forward-only by contract), warping ALL K channels
            m_img = prev_mask.transpose(0, 2, 3, 1)  # (B, H, W, K)
            warped, _ = warp_fn(m_img, flow)
            expt = warped.transpose(0, 3, 1, 2)
        else:
            # training: warp ALL K channels (straight-through grad invariant)
            # via the fused warp+att op — its custom VJP exploits that the
            # att map's constant-ones gradient is channel-uniform, replacing
            # autodiff's K-channel tap scatter with ONE splat
            # (ops/att_map.py::warped_regional_attention_small; exact)
            from rmnet_tpu.ops.att_map import warped_regional_attention_small

            return warped_regional_attention_small(
                prev_mask, flow, out_hw, offset, 16,
                self.prob_threshold, self.n_pts_threshold,
                self.n_bbox_loose_pixels,
            )
        att_small, _ = regional_attention_small(
            expt, out_hw, offset, 16,
            self.prob_threshold, self.n_pts_threshold, self.n_bbox_loose_pixels,
        )
        return att_small

    # -------------------------------------------------------------- segment
    def segment(
        self,
        variables: Dict[str, Any],
        frame: jnp.ndarray,      # (B, H, W, 3)
        att_small: jnp.ndarray,  # (B, K, h, w) regional query map at 1/16
        mem_keys: jnp.ndarray,   # (B, K, S, h, w, Ck)
        mem_values: jnp.ndarray, # (B, K, S, h, w, Cv)
        slot_valid: jnp.ndarray, # (S,), (B, S) per-stream, or (B, K, S) bool
        obj_valid: jnp.ndarray,  # (B, K) bool
        mem_bboxes: Optional[jnp.ndarray] = None,  # (B, K, S, 4) int32
    ) -> Tuple[jnp.ndarray, Optional[Dict[str, Any]]]:
        """One segmentation pass -> ((B, K, H, W) logits, batch_stats|None)
        (reference models/rmnet.py:304-383). ``att_small`` is the /16-grid
        regional map (get_att_small), matching the reference's full-res map
        after its F.interpolate(scale_factor=1/16) downsample."""
        B, K, S = mem_keys.shape[:3]
        (frame_p,), pads = pad_divide_by([frame], 16)
        Hp, Wp = frame_p.shape[1:3]

        enc = self._apply(variables, "encode_query", frame_p)
        (k4, v4, r3, r2), bn = enc if self.train_bn else (enc, None)
        if bn is not None:
            variables = {**variables, "batch_stats": bn}
        h, w = k4.shape[1:3]

        # regional query embedding (models/rmnet.py:355-358).
        # Slot 0 (background) never reaches the reader/decoder — the
        # reference only batches real objects (models/rmnet.py:327-349) —
        # so K-1 slots run, saving a decoder pass per frame.
        Ko = K - 1
        # cast the binary map to the query compute dtype (exact {0,1}): see
        # memorize — keeps the regional query embedding and the memory read
        # in bf16 when training with TRAIN.BF16
        att = att_small.astype(k4.dtype)[:, 1:, :, :, None]  # (B, Ko, h, w, 1)
        k4e = k4[:, None] * att  # (B, Ko, h, w, Ck)
        v4e = v4[:, None] * att

        if slot_valid.ndim == 1:
            slot_valid_bk = jnp.broadcast_to(slot_valid[None], (B * Ko, S))
        elif slot_valid.ndim == 2:  # (B, S): per-stream, shared across objects
            slot_valid_bk = jnp.broadcast_to(
                slot_valid[:, None], (B, Ko, S)
            ).reshape(B * Ko, S)
        else:
            slot_valid_bk = slot_valid[:, 1:].reshape(B * Ko, S)

        if self.use_flash_attention:
            from rmnet_tpu.ops.flash_attention import memory_read_flash

            # bank bboxes drive block-sparse tile skipping: memory k/v are
            # exactly zero outside each slot's regional box (memorize masks
            # them by the rasterized att map), so the kernel visits only
            # in-box tiles (SURVEY §7.3; reference reg_att_map_generator.cu
            # + models/rmnet.py:243-248 shrink the attention the same way)
            box_bk = (
                mem_bboxes[:, 1:].reshape(B * Ko, S, 4)
                if mem_bboxes is not None else None
            )
            _read = functools.partial(memory_read_flash, bboxes=box_bk)
        else:
            _read = memory_read
        m4, _ = _read(
            mem_keys[:, 1:].reshape((B * Ko, S, h, w, -1)),
            mem_values[:, 1:].reshape((B * Ko, S, h, w, -1)),
            k4e.reshape(B * Ko, h, w, -1),
            v4e.reshape(B * Ko, h, w, -1),
            slot_valid_bk,
        )

        # decode per object. The skip branches (convFS/ResFS of RF3/RF2)
        # depend only on the shared r3/r2 — compute them ONCE per frame and
        # broadcast, instead of re-running them per object like the
        # reference (models/rmnet.py:332-335): saves ~61 GMAC per extra
        # object per frame at 480p, identical math.
        s3, s2 = self._apply(variables, "decode_skips", r3, r2)
        s3e = jnp.broadcast_to(s3[:, None], (B, Ko) + s3.shape[1:]).reshape(
            (B * Ko,) + s3.shape[1:]
        )
        s2e = jnp.broadcast_to(s2[:, None], (B, Ko) + s2.shape[1:]).reshape(
            (B * Ko,) + s2.shape[1:]
        )
        logits2 = self._apply(variables, "decode_from_skips", m4, s3e, s2e)  # (B*Ko, Hp, Wp, 2)
        ps = jax.nn.softmax(logits2, axis=-1)[..., 1]  # fg prob (B*Ko, Hp, Wp)
        ps = jnp.pad(ps.reshape(B, Ko, Hp, Wp), ((0, 0), (1, 0), (0, 0), (0, 0)))

        logit = soft_aggregation(ps, obj_valid)  # (B, K, Hp, Wp)
        return unpad(logit, pads, spatial_axes=(-2, -1)), bn

    # ------------------------------------------------------------------ step
    def step(
        self,
        variables: Dict[str, Any],
        state: VOSState,
        frame: jnp.ndarray,        # (B, H, W, 3) current frame t
        flow: jnp.ndarray,         # (B, H, W, 2) flow t -> t-1
        gt_mask: jnp.ndarray,      # (B, K, H, W) gt one-hot at t (zeros at test
                                   #  time for frames without annotations)
        any_new: jnp.ndarray,      # () or (B,) bool — new objects revealed at t
        commit: jnp.ndarray,       # () or (B,) bool — commit frame t-1
        obj_valid: jnp.ndarray,    # (B, K) bool — video-level object slots
    ) -> Tuple[VOSState, jnp.ndarray, Optional[Dict[str, Any]]]:
        """One timestep of the reference loop (models/rmnet.py:410-450).

        Returns (new_state, est_mask_t, batch_stats): est_mask_t = softmax
        logits; batch_stats is the updated BN collection (None unless
        ``train_bn``) — memorize-encoder stats then query-encoder stats,
        the reference's per-frame module-call order.

        Two bank-write modes, selected by ``state.bank.cursor``'s rank:

        * scalar cursor (training / single video / lockstep batch): one
          shared commit decision, ``lax.cond``-guarded slot write — the
          branch skips the write entirely on non-commit steps;
        * ``(B,)`` cursor (ragged multi-stream serving): ``commit`` and
          ``any_new`` are per-stream vectors, each stream writes at its own
          ring position via a batched one-slot scatter (non-committing
          streams rewrite their current slot content — a no-op — so a
          single program serves every schedule; the reference's loop is
          strictly per-video, core/test.py:59-118).
        """
        bank = state.bank
        B, K, S = bank.keys.shape[:3]
        per_stream = bank.cursor.ndim == 1
        any_new = jnp.asarray(any_new)
        commit = jnp.asarray(commit)
        if per_stream and commit.ndim == 0:
            commit = jnp.broadcast_to(commit, (B,))
        if per_stream and any_new.ndim == 0:
            any_new = jnp.broadcast_to(any_new, (B,))

        # ---- memorize frame t-1 with its estimated mask
        prev_k, prev_v, prev_box, bn = self.memorize(
            variables, state.prev_frame, state.prev_mask, obj_valid
        )
        if bn is not None:
            variables = {**variables, "batch_stats": bn}

        # commit to the persistent bank: FIFO ring — below capacity this is
        # exactly the reference's append-only bank; beyond capacity the
        # OLDEST committed slot is evicted (the reference never evicts and
        # grows without bound; a fixed ring is the TPU-native policy)
        write_pos = bank.cursor % S

        if per_stream:
            def write(buf, item):
                # keep non-committing streams intact by writing back the
                # slot's CURRENT content (a one-slot gather + scatter per
                # stream — ~K*h*w*C elements, negligible vs the frame math;
                # a lane-wide `where` over the whole bank would instead
                # stream all of it through HBM every step)
                cur = jax.vmap(
                    lambda b, p: jax.lax.dynamic_index_in_dim(
                        b, p, axis=1, keepdims=False)
                )(buf, write_pos)  # (B, K, ...)
                cb = commit.reshape((B,) + (1,) * (item.ndim - 1))
                item = jnp.where(cb, item, cur)
                return jax.vmap(
                    lambda b, it, p: jax.lax.dynamic_update_index_in_dim(
                        b, it, p, axis=1)
                )(buf, item, write_pos)
        else:
            def write(buf, item):
                return jax.lax.cond(
                    commit,
                    lambda b: jax.lax.dynamic_update_index_in_dim(
                        b, item, write_pos, axis=2),
                    lambda b: b,
                    buf,
                )

        new_keys = write(bank.keys, prev_k)
        new_values = write(bank.values, prev_v)
        new_bboxes = write(bank.bboxes, prev_box)
        new_cursor = bank.cursor + commit.astype(jnp.int32)

        # bank view for this step: committed slots ++ ephemeral prev slot.
        # The reference builds `this = OLD bank ++ prev` (models/rmnet.py:
        # 416-422), so prev must appear exactly once: validity uses the OLD
        # cursor, and when the ring wrapped, the slot just overwritten with
        # prev is excluded for this step (prev rides the ephemeral slot).
        this_keys = jnp.concatenate([new_keys, prev_k[:, :, None]], axis=2)
        this_values = jnp.concatenate([new_values, prev_v[:, :, None]], axis=2)
        slot_idx = jnp.arange(S + 1)
        if per_stream:
            slot_valid = slot_idx[None] < jnp.minimum(bank.cursor, S)[:, None]
            slot_valid = slot_valid & ~(
                commit[:, None] & (slot_idx[None] == write_pos[:, None])
            )
            slot_valid = slot_valid.at[:, S].set(True)  # (B, S+1)
        else:
            slot_valid = slot_idx < jnp.minimum(bank.cursor, S)
            slot_valid = slot_valid & ~(commit & (slot_idx == write_pos))
            slot_valid = slot_valid.at[S].set(True)

        # ---- segment current frame (att map fused straight to the /16 grid)
        H, W = frame.shape[1:3]
        lw, uw, lh, uh = divide_pads(H, W, 16)
        out_hw = ((H + lh + uh) // 16, (W + lw + uw) // 16)
        att_small = self.get_att_small(state.prev_mask, flow, out_hw, (lh, lw))
        this_bboxes = jnp.concatenate(
            [new_bboxes, prev_box[:, :, None]], axis=2
        ) if self.use_flash_attention else None
        logit, bn = self.segment(
            variables, frame, att_small, this_keys, this_values, slot_valid,
            obj_valid, mem_bboxes=this_bboxes,
        )

        # ---- new-object injection (models/rmnet.py:436-442)
        present = _present_objects(gt_mask)  # (B, K)
        newly = present & (~state.exist) & (
            any_new[:, None] if any_new.ndim == 1 else any_new
        )
        inj = gt_mask.astype(logit.dtype) * NEW_OBJECT_SCALE + NEW_OBJECT_BIAS
        logit = jnp.where(newly[:, :, None, None], inj, logit)
        exist = state.exist | newly

        # ---- suppress non-existing objects (models/rmnet.py:444-448)
        logit = jnp.where(exist[:, :, None, None], logit, SUPPRESSED)

        est_mask = jax.nn.softmax(logit, axis=1)
        new_state = VOSState(
            bank=MemoryBank(new_keys, new_values, new_bboxes, new_cursor),
            # keep the carry dtype stable (bf16 streaming state stays bf16)
            prev_mask=est_mask.astype(state.prev_mask.dtype),
            prev_frame=frame.astype(state.prev_frame.dtype),
            exist=exist,
            t=state.t + 1,
        )
        return new_state, est_mask, bn

    # ------------------------------------------------------------ init state
    def init_state(
        self,
        frames0: jnp.ndarray,   # (B, H, W, 3) first frame
        masks0: jnp.ndarray,    # (B, K, H, W) gt one-hot at t=0
        capacity: int,
        key_dim: int = 128,
        val_dim: int = 512,
        dtype=jnp.float32,
        kv_dtype=None,
        per_stream_cursor: bool = False,
    ) -> VOSState:
        """``kv_dtype`` overrides the bank key/value buffer dtype — bf16
        training keeps masks/est f32 (soft_aggregation is f32-pinned) while
        the memorize heads emit bf16; the bank must match the heads or the
        ring write rejects the dtype mix. ``per_stream_cursor`` allocates a
        ``(B,)`` cursor so each stream in the batch may follow its own
        commit schedule (ragged multi-stream serving; see ``step``)."""
        B, K, H, W = masks0.shape
        from rmnet_tpu.ops.pad import divide_pads

        kv_dtype = kv_dtype or dtype
        lw, uw, lh, uh = divide_pads(H, W, 16)
        h, w = (H + lh + uh) // 16, (W + lw + uw) // 16
        bank = MemoryBank(
            keys=jnp.zeros((B, K, capacity, h, w, key_dim), kv_dtype),
            values=jnp.zeros((B, K, capacity, h, w, val_dim), kv_dtype),
            bboxes=jnp.zeros((B, K, capacity, 4), jnp.int32),
            cursor=jnp.zeros((B,) if per_stream_cursor else (), jnp.int32),
        )
        exist = _present_objects(masks0)
        return VOSState(
            bank=bank,
            prev_mask=masks0.astype(dtype),
            prev_frame=frames0,
            exist=exist,
            t=jnp.ones((), jnp.int32),
        )

    # ------------------------------------------------------- chunked stream
    def chunk_forward(
        self,
        variables: Dict[str, Any],
        tfn_apply,                  # callable(curr, prev) -> flow, or None
        state: VOSState,
        frames: jnp.ndarray,        # (C, B, H, W, 3) chunk of frames
        gt_masks: jnp.ndarray,      # (C, B, K, H, W) one-hot (zeros when absent)
        any_new: jnp.ndarray,       # (C,) or (C, B) bool
        commit: jnp.ndarray,        # (C,) or (C, B) — commit frame t-1
        step_valid: jnp.ndarray,    # (C,) or (C, B) bool — False for padding
        obj_valid: jnp.ndarray,     # (B, K) bool
        flows: Optional[jnp.ndarray] = None,  # (C, B, H, W, 2) when given
    ) -> Tuple[VOSState, jnp.ndarray]:
        """Scan a fixed-size chunk of frames in ONE dispatch.

        TPU-native streaming: state stays device-resident between chunk
        dispatches, so per-frame host<->device traffic reduces to the frames
        themselves. When ``tfn_apply`` is given, TinyFlowNet computes the
        backward flow from the carried previous frame inside the scan —
        matching the reference validation path where RMNet consumes
        TinyFlowNet-estimated flows (core/test.py:87-88).

        ``step_valid`` masks tail padding: padded steps run but leave the
        state untouched, so any chunk length divides any video length. The
        ``(C, B)`` forms carry PER-STREAM flags (ragged multi-stream
        serving): each stream freezes independently once past its own last
        frame, and commits on its own schedule (requires a ``(B,)``-cursor
        state, init_state(per_stream_cursor=True)).
        """
        B = frames.shape[1]

        def body(carry, xs):
            if flows is None:
                frame, gt_mask, new_t, commit_t, valid_t = xs
                flow = tfn_apply(frame, carry.prev_frame)
            else:
                frame, gt_mask, new_t, commit_t, valid_t, flow = xs
            # fold validity into the commit decision: a padded step's bank
            # write becomes the no-op itself (cursor included), so the BIG
            # state leaves (ring keys/values, ~hundreds of MB at capacity)
            # never need a select-revert afterwards — only the frame-sized
            # leaves below do
            commit_t = commit_t & valid_t
            new_state, est, _ = self.step(
                variables, carry, frame, flow, gt_mask, new_t, commit_t, obj_valid
            )
            if valid_t.ndim == 0:
                keep = lambda n, o: (
                    jnp.where(valid_t, n, o) if n.dtype == o.dtype else n
                )
            else:
                # per-stream freeze: broadcast the (B,) validity over each
                # batch-leading leaf; the scalar frame counter ``t``
                # advances while ANY stream is live
                def keep(n, o):
                    if n.dtype != o.dtype:
                        return n
                    if n.ndim >= 1 and n.shape[0] == B:
                        v = valid_t.reshape((B,) + (1,) * (n.ndim - 1))
                        return jnp.where(v, n, o)
                    return jnp.where(jnp.any(valid_t), n, o)
            new_state = VOSState(
                bank=new_state.bank,  # protected by the masked commit
                prev_mask=keep(new_state.prev_mask, carry.prev_mask),
                prev_frame=keep(new_state.prev_frame, carry.prev_frame),
                exist=keep(new_state.exist, carry.exist),
                t=keep(new_state.t, carry.t),
            )
            return new_state, est

        xs = (frames, gt_masks, any_new, commit, step_valid)
        if flows is not None:
            xs = xs + (flows,)
        new_state, est_seq = jax.lax.scan(body, state, xs)
        return new_state, est_seq  # est_seq: (C, B, K, H, W)

    # --------------------------------------------------------- full sequence
    def forward_video(
        self,
        variables: Dict[str, Any],
        frames: jnp.ndarray,        # (B, T, H, W, 3)
        masks: jnp.ndarray,         # (B, T, K, H, W) gt one-hot
        optical_flows: jnp.ndarray, # (B, T, H, W, 2)
        n_objects: jnp.ndarray,     # (B, T) int
    ) -> jnp.ndarray:
        """Whole-sequence forward via lax.scan (training / short-clip eval).

        Returns est_masks (B, T, K, H, W); frame 0 is the ground truth
        (models/rmnet.py:397). When ``train_bn``, returns
        (est_masks, batch_stats) — the BN running stats after the whole
        sequence, threaded through the scan carry.
        """
        B, T, K, H, W = masks.shape
        n_max = jnp.max(n_objects, axis=1)  # (B,)
        obj_valid = (jnp.arange(K)[None, :] >= 1) & (
            jnp.arange(K)[None, :] <= n_max[:, None]
        )

        # frame-level flags (reference models/rmnet.py:404-408)
        changed = jnp.any(n_objects[:, 1:] != n_objects[:, :-1], axis=0)  # (T-1,)
        any_new = jnp.concatenate([jnp.zeros((1,), bool), changed])       # (T,)
        in_to_memorize = jnp.asarray(
            [(t % self.memorize_every) == 0 for t in range(T)]
        )
        commit = in_to_memorize | any_new  # commit frame (t-1) iff flagged

        state = self.init_state(
            frames[:, 0], masks[:, 0], capacity=max(T - 1, 1),
            dtype=frames.dtype,
            # bf16 training: the kv bank follows the heads' compute dtype
            # while masks/est stay f32 (soft_aggregation is f32-pinned)
            kv_dtype=self.model.dtype or frames.dtype,
        )

        step_fn = jax.checkpoint(self.step) if self.remat else self.step
        params_only = {k: v for k, v in variables.items() if k != "batch_stats"}
        bn0 = variables.get("batch_stats") if self.train_bn else None

        def body(carry, xs):
            st, bn = carry
            frame, flow, gt_mask, new_t, commit_tm1 = xs
            vars_t = {**params_only, "batch_stats": bn} if bn is not None else variables
            new_state, est, bn_new = step_fn(
                vars_t, st, frame, flow, gt_mask, new_t, commit_tm1, obj_valid
            )
            return (new_state, bn_new if bn_new is not None else bn), est

        xs = (
            frames[:, 1:].swapaxes(0, 1),         # (T-1, B, H, W, 3)
            optical_flows[:, 1:].swapaxes(0, 1),
            masks[:, 1:].swapaxes(0, 1),
            any_new[1:],
            commit[:-1],                           # commit decision for frame t-1
        )
        (_, bn_out), est_seq = jax.lax.scan(body, (state, bn0), xs)
        est_seq = est_seq.swapaxes(0, 1)  # (B, T-1, K, H, W)
        est0 = masks[:, :1].astype(est_seq.dtype)
        est = jnp.concatenate([est0, est_seq], axis=1)
        if self.train_bn:
            return est, bn_out
        return est
