"""Streaming VOS inference engine: jitted per-frame step + flow pipeline.

The reference evaluates a video by materializing all frames on the GPU and
looping in Python with a cat-grown memory bank (models/rmnet.py:410-450).
Here the engine compiles ONE step function per (H, W, K, capacity) signature
— state is donated, so the memory bank updates in-place in HBM — and
iterates frames from the host, overlapping host decode with device compute.
TinyFlowNet flows are computed in batched chunks of frame pairs.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rmnet_tpu.models.rmnet import RMNet, RMNetApply, VOSState
from rmnet_tpu.models.tiny_flownet import TinyFlowNet
from rmnet_tpu.ops import resize_bilinear, resize_nearest


class InferenceEngine:
    """Holds models + variables and runs videos through jitted steps."""

    def __init__(
        self,
        cfg,
        rmnet_variables: Dict[str, Any],
        tflownet_variables: Dict[str, Any],
        memorize_every: Optional[int] = None,
        capacity: Optional[int] = None,
        dtype=jnp.float32,
    ):
        self.cfg = cfg
        self.dtype = dtype
        self.rmnet = RMNet(dtype=dtype if dtype != jnp.float32 else None)
        self.tflownet = TinyFlowNet(dtype=dtype if dtype != jnp.float32 else None)
        self.rmnet_vars = rmnet_variables
        self.tfn_vars = tflownet_variables
        self.memorize_every = memorize_every or cfg.TEST.MEMORIZE_EVERY
        self.capacity = capacity or cfg.TEST.MEMORY_CAPACITY
        self.apply = RMNetApply(
            self.rmnet, memorize_every=self.memorize_every
        )
        self._step_fn = None
        self._flow_fn = None

    # ------------------------------------------------------------- jit fns
    def _get_step(self):
        if self._step_fn is None:
            apply = self.apply

            @functools.partial(jax.jit, donate_argnums=(1,))
            def step(variables, state, frame, flow, gt_mask, any_new, commit, obj_valid):
                return apply.step(
                    variables, state, frame, flow, gt_mask, any_new, commit, obj_valid
                )

            self._step_fn = step
        return self._step_fn

    def _get_flow(self):
        if self._flow_fn is None:
            tfn = self.tflownet

            @jax.jit
            def flow_pairs(variables, curr, prev):
                return tfn.apply(variables, curr, prev, method="pair_forward")

            self._flow_fn = flow_pairs
        return self._flow_fn

    # ------------------------------------------------------------ pipeline
    def compute_flows(self, frames: np.ndarray, chunk: int = 8) -> np.ndarray:
        """TinyFlowNet backward flows for a (T, H, W, 3) video; flow[0] = 0.

        Pairs are batched in fixed-size chunks (padded on the last chunk) so
        only one TinyFlowNet program is compiled regardless of T.
        """
        T, H, W, _ = frames.shape
        flows = np.zeros((T, H, W, 2), np.float32)
        if T == 1:
            return flows
        flow_fn = self._get_flow()
        curr_all = frames[1:]
        prev_all = frames[:-1]
        n = T - 1
        for start in range(0, n, chunk):
            end = min(start + chunk, n)
            curr = curr_all[start:end]
            prev = prev_all[start:end]
            if end - start < chunk:  # pad to fixed batch for compile reuse
                pad = chunk - (end - start)
                curr = np.concatenate([curr, np.repeat(curr[-1:], pad, 0)], 0)
                prev = np.concatenate([prev, np.repeat(prev[-1:], pad, 0)], 0)
            out = np.asarray(flow_fn(self.tfn_vars, jnp.asarray(curr), jnp.asarray(prev)))
            flows[1 + start : 1 + end] = out[: end - start]
        return flows

    def run_video(
        self,
        frames: np.ndarray,        # (T, H, W, 3) normalized float32
        masks: np.ndarray,         # (T, K, H, W) gt one-hot (frame 0 required)
        n_objects: np.ndarray,     # (T,) int
        flows: Optional[np.ndarray] = None,  # (T, H, W, 2); None -> TinyFlowNet
    ) -> np.ndarray:
        """Stream a full video; returns est_masks (T, K, H, W) float32."""
        T, K, H, W = masks.shape
        if flows is None:
            flows = self.compute_flows(frames)

        n_max = int(np.max(n_objects))
        obj_valid = (np.arange(K) >= 1) & (np.arange(K) <= n_max)
        obj_valid = jnp.asarray(obj_valid[None])  # (1, K)

        any_new = np.zeros((T,), bool)
        any_new[1:] = n_objects[1:] != n_objects[:-1]
        in_to_mem = np.array([(t % self.memorize_every) == 0 for t in range(T)])
        commit = in_to_mem | any_new

        state = self.apply.init_state(
            jnp.asarray(frames[None, 0]),
            jnp.asarray(masks[None, 0].astype(np.float32)),
            capacity=self.capacity,
            dtype=self.dtype,
        )
        step = self._get_step()

        est = np.zeros((T, K, H, W), np.float32)
        est[0] = masks[0]
        for t in range(1, T):
            state, est_t = step(
                self.rmnet_vars,
                state,
                jnp.asarray(frames[None, t]),
                jnp.asarray(flows[None, t]),
                jnp.asarray(masks[None, t].astype(np.float32)),
                jnp.asarray(bool(any_new[t])),
                jnp.asarray(bool(commit[t - 1])),
                obj_valid,
            )
            est[t] = np.asarray(est_t[0], np.float32)
        return est

    # -------------------------------------------------- multi-scale / flip
    def multi_scale_inference(
        self,
        frames: np.ndarray,      # (T, H, W, 3)
        masks: np.ndarray,       # (T, K, H, W)
        n_objects: np.ndarray,   # (T,)
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Test-time augmentation: frame scales + optional LR flip, averaged
        (capability of reference utils/helpers.py:44-78). Returns
        (est_flows at 1.0-scale resolution, est_probs (T, K, H, W))."""
        cfg = self.cfg
        T, K, H, W = masks.shape
        probs_acc = []
        flows_out = None
        for fs in cfg.TEST.FRAME_SCALES:
            if fs == 1.0:
                f_s, m_s = frames, masks
            else:
                hs, ws = int(H * fs), int(W * fs)
                f_s = np.asarray(
                    resize_bilinear(jnp.asarray(frames), (hs, ws), align_corners=False)
                )
                m_s = np.asarray(
                    resize_nearest(
                        jnp.asarray(masks.astype(np.float32)), (hs, ws),
                        spatial_axes=(-2, -1),
                    )
                ).astype(masks.dtype)
            fl_s = self.compute_flows(f_s)
            est = self.run_video(f_s, m_s, n_objects, fl_s)
            if fs != 1.0:
                est = np.asarray(
                    resize_bilinear(
                        jnp.asarray(est), (H, W), spatial_axes=(-2, -1),
                        align_corners=False,
                    )
                )
                fl_up = np.asarray(
                    resize_bilinear(jnp.asarray(fl_s), (H, W), align_corners=False)
                ) / fs
            else:
                fl_up = fl_s
            if flows_out is None:
                flows_out = fl_up
            probs_acc.append(est)

            if cfg.TEST.FLIP_LR:
                f_f = f_s[:, :, ::-1].copy()
                m_f = m_s[:, :, :, ::-1].copy()
                fl_f = fl_s[:, :, ::-1].copy()
                fl_f[..., 0] = -fl_f[..., 0]
                est_f = self.run_video(f_f, m_f, n_objects, fl_f)
                est_f = est_f[:, :, :, ::-1]
                if fs != 1.0:
                    est_f = np.asarray(
                        resize_bilinear(
                            jnp.asarray(est_f), (H, W), spatial_axes=(-2, -1),
                            align_corners=False,
                        )
                    )
                probs_acc.append(est_f)
        return flows_out, np.mean(probs_acc, axis=0)


def build_models(cfg, rng_seed: int = 0, dtype=None):
    """Initialize RMNet + TinyFlowNet variables (kaiming heads, reference
    init scheme: core/train.py:48-53)."""
    rmnet = RMNet(dtype=dtype)
    tfn = TinyFlowNet(dtype=dtype)
    k1, k2 = jax.random.split(jax.random.PRNGKey(rng_seed))
    rm_vars = rmnet.init(
        k1, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32)), jnp.zeros((1, 32, 32))
    )
    tfn_vars = tfn.init(k2, jnp.zeros((1, 2, 64, 64, 3)))
    rm_vars = jax.tree_util.tree_map(np.asarray, rm_vars)
    tfn_vars = jax.tree_util.tree_map(np.asarray, tfn_vars)
    return rmnet, tfn, dict(rm_vars), dict(tfn_vars)
