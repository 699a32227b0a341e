"""Streaming VOS inference engine: chunked-scan dispatches, device-resident state.

The reference evaluates a video by materializing all frames on the GPU and
looping in Python with a cat-grown memory bank (models/rmnet.py:410-450).
Host<->device links can be slow and high-latency (PCIe at best, an RPC
tunnel at worst), so this engine is built around three rules:

  1. weights live on the device permanently (device_put once);
  2. the per-frame loop runs as a lax.scan over fixed-size CHUNKS of frames
     — one XLA dispatch per chunk, VOS state donated and device-resident
     across chunks, TinyFlowNet flow computed inside the scan from the
     carried previous frame (no flow transfers at all);
  3. only argmax label maps (uint8) come back to the host unless the caller
     asks for probabilities (test-time augmentation averaging).

One chunk program serves every video length (tail steps are masked via
``step_valid``), so each (H, W, K, capacity) signature compiles exactly once.
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
    """Holds models + device-resident variables and runs videos."""

    def __init__(
        self,
        cfg,
        rmnet_variables: Dict[str, Any],
        tflownet_variables: Dict[str, Any],
        memorize_every: Optional[int] = None,
        capacity: Optional[int] = None,
        dtype=jnp.float32,
        chunk: int = 8,
        use_flash_attention: Optional[bool] = None,
        device=None,
        apply_overrides: Optional[Dict[str, Any]] = None,
    ):
        # share compiles across processes (eval_server restarts, farm
        # workers, bench runs): ~25-50 s Mosaic + XLA per geometry otherwise
        from rmnet_tpu.utils.compile_cache import enable_persistent_cache

        enable_persistent_cache()
        self.cfg = cfg
        self.dtype = dtype
        self.chunk = chunk
        self.rmnet = RMNet(dtype=dtype if dtype != jnp.float32 else None)
        self.tflownet = TinyFlowNet(dtype=dtype if dtype != jnp.float32 else None)
        # weights are device-resident for the engine's lifetime; an explicit
        # ``device`` pins the whole engine there (eval-farm replicas — the
        # TPU twin of the reference's per-GPU .cuda(device) pinning,
        # utils/eval_server.py:78-87)
        self.device = device
        self.rmnet_vars = jax.device_put(rmnet_variables, device)
        self.tfn_vars = jax.device_put(tflownet_variables, device)
        self.memorize_every = memorize_every or cfg.TEST.MEMORIZE_EVERY
        # capacity 0 = AUTO: derive per video so the bank never evicts (the
        # reference's bank grows without bound and never evicts,
        # models/rmnet.py:420-422); a fixed capacity evicts the oldest slot
        # on long videos, which silently diverges — warned loudly in _run.
        self.capacity = capacity if capacity is not None else cfg.TEST.MEMORY_CAPACITY
        self._use_flash_pref = use_flash_attention
        # base apply config; _apply_for() only swaps the per-capacity flash
        # choice, so both ``apply_overrides`` and direct ``engine.apply = …``
        # assignment are honored by every run path
        self.apply = RMNetApply(
            self.rmnet,
            memorize_every=self.memorize_every,
            skip_bg_warp=True,  # inference: slot 0 never reaches the bbox op
            # bf16 serving: 1-gather u8-packed att-map warp (f32 eval keeps
            # exact bilinear taps for golden-parity runs)
            warp_u8=(dtype == jnp.bfloat16),
            **(apply_overrides or {}),
        )
        self._chunk_fns: Dict[Tuple, Any] = {}
        self._flow_fn = None

    def update_weights(self, rmnet_variables, tflownet_variables) -> None:
        """Swap in new checkpoint weights WITHOUT recompiling: both weight
        sets are jit arguments of every compiled program, so a long-running
        scorer (eval_server farm, per-epoch validation) pays tracing and
        Mosaic/XLA compilation once per geometry, not once per checkpoint."""
        self.rmnet_vars = jax.device_put(rmnet_variables, self.device)
        self.tfn_vars = jax.device_put(tflownet_variables, self.device)

    def _apply_for(self) -> RMNetApply:
        # Memory-read backend. The block-sparse Pallas kernel beats dense
        # XLA at every bank size (S=8: 1.25 ms vs 1.80; S=24: 1.68 vs 3.34;
        # S=40: 3.01 vs 5.35 — docs/PERFORMANCE.md round-3 table) and the
        # coarse capacity bucket means ONE ~25-50 s Mosaic compile per
        # (H, W, K) geometry. That compile never amortizes inside a single
        # eval sweep, so it stays OPT-IN (use_flash_attention=True or
        # RMNET_FLASH=1) for long-running processes — serving, or an
        # eval_server scoring many checkpoints at one geometry; default is
        # the dense MXU read.
        import dataclasses

        return dataclasses.replace(
            self.apply, use_flash_attention=self._flash_enabled()
        )

    def _capacity_for(self, T: int, commit: np.ndarray) -> int:
        """Per-video bank capacity: exact commit count, bucketed to a
        multiple of 8 so videos share compiled programs; a configured
        fixed capacity is honored but warned about when it would evict.

        With the Pallas flash read the bucket is much coarser (default 32,
        RMNET_FLASH_BUCKET): padded slots are invalid and the block-sparse
        kernel skips their tiles for free, so one big bucket means ONE
        Mosaic compile per (H, W, K) geometry for a whole eval sweep
        instead of one per bank size."""
        needed = int(np.sum(commit[: max(T - 1, 1)]))
        if self.capacity:
            if needed > self.capacity:
                import logging

                logging.warning(
                    "memory bank capacity %d < %d commits for a %d-frame "
                    "video: the %d oldest committed memories (including "
                    "frame 0's ground-truth memory) will be evicted — the "
                    "reference never evicts. Set TEST.MEMORY_CAPACITY=0 "
                    "for auto sizing.",
                    self.capacity, needed, T, needed - self.capacity,
                )
            return self.capacity
        if self._flash_enabled():
            import os

            # clamp: RMNET_FLASH_BUCKET=0 would ZeroDivisionError and a
            # negative value would yield a nonsensical capacity
            bucket = max(1, int(os.environ.get("RMNET_FLASH_BUCKET", "32")))
            return max(bucket, -(-needed // bucket) * bucket)
        return max(8, -(-needed // 8) * 8)

    def _flash_enabled(self) -> bool:
        import os

        use_flash = self._use_flash_pref
        if use_flash is None:
            use_flash = os.environ.get("RMNET_FLASH") == "1"
        return bool(use_flash) and jax.default_backend() != "cpu"

    # ------------------------------------------------------------- jit fns
    def _get_chunk_fn(self, use_tfn_flow: bool, return_probs: bool,
                      raw_inputs: bool = False, n_slots: int = 0,
                      capacity: Optional[int] = None):
        del capacity  # bank size no longer selects the read backend
        apply = self._apply_for()
        # the apply config itself is part of the key, so mutating
        # engine.apply between runs (e.g. dataclasses.replace overrides)
        # cannot hit a stale cached closure
        key = (use_tfn_flow, return_probs, raw_inputs, n_slots, apply)
        if key not in self._chunk_fns:
            tfn = self.tflownet
            mean = jnp.asarray(self.cfg.CONST.DATASET_MEAN, jnp.float32)
            std = jnp.asarray(self.cfg.CONST.DATASET_STD, jnp.float32)

            # both weight sets are ARGUMENTS (not traced-in constants), so
            # update_weights() swaps checkpoints without recompiling — the
            # eval farm and per-epoch validation reuse compiled programs
            @functools.partial(jax.jit, donate_argnums=(2,), static_argnums=())
            def chunk_fn(rm_vars, tfn_vars, state, frames, gt_masks, any_new,
                         commit, step_valid, obj_valid, flows=None):
                def tfn_flow(curr, prev):
                    return tfn.apply(tfn_vars, curr, prev, method="pair_forward")

                if raw_inputs:
                    # on-device preprocessing: uint8 RGB -> ImageNet-normalized
                    # floats; uint8 label maps -> one-hot (255-ignore -> zeros)
                    frames = (frames.astype(jnp.float32) / 255.0 - mean) / std
                    labels_in = gt_masks.astype(jnp.int32)  # (C, B, H, W)
                    gt_masks = jnp.moveaxis(
                        jax.nn.one_hot(labels_in, n_slots, dtype=frames.dtype), -1, 2
                    )  # (C, B, K, H, W)
                new_state, est = apply.chunk_forward(
                    rm_vars,
                    tfn_flow if use_tfn_flow else None,
                    state,
                    frames,
                    gt_masks.astype(frames.dtype),
                    any_new,
                    commit,
                    step_valid,
                    obj_valid,
                    flows=flows,
                )
                if return_probs:
                    return new_state, est.astype(jnp.float32)
                labels = jnp.argmax(est, axis=2).astype(jnp.uint8)  # (C, B, H, W)
                K = est.shape[2]
                # pack the label stream (lossless): the device->host link is
                # the streaming bottleneck long before the chip is (a
                # tunneled link moves ~8 MB/s; even PCIe gains from fewer
                # bytes). base-3 5 px/byte for K<=3, 2 bits/px for K<=4,
                # 4 bits/px for K<=16.
                Wd = labels.shape[-1]
                if K <= 3 and Wd >= 20:
                    pad = (-Wd) % 5
                    lp = jnp.pad(labels, ((0, 0), (0, 0), (0, 0), (0, pad)))
                    labels = (lp[..., 0::5] + 3 * lp[..., 1::5]
                              + 9 * lp[..., 2::5] + 27 * lp[..., 3::5]
                              + 81 * lp[..., 4::5])
                elif K <= 4 and Wd >= 20:
                    pad = (-Wd) % 4
                    lp = jnp.pad(labels, ((0, 0), (0, 0), (0, 0), (0, pad)))
                    labels = (lp[..., 0::4] | (lp[..., 1::4] << 2)
                              | (lp[..., 2::4] << 4) | (lp[..., 3::4] << 6))
                elif K <= 16 and Wd % 2 == 0:
                    labels = labels[..., 0::2] | (labels[..., 1::2] << 4)
                return new_state, labels

            self._chunk_fns[key] = chunk_fn
        return self._chunk_fns[key]

    def _get_flow(self):
        if self._flow_fn is None:
            tfn = self.tflownet

            @jax.jit
            def flow_pairs(variables, curr, prev):
                return tfn.apply(variables, curr, prev, method="pair_forward")

            self._flow_fn = flow_pairs
        return self._flow_fn

    # ------------------------------------------------------------ pipeline
    def compute_flows(self, frames: np.ndarray, chunk: Optional[int] = None) -> np.ndarray:
        """TinyFlowNet backward flows for a (T, H, W, 3) video; flow[0] = 0."""
        chunk = chunk or self.chunk
        T, H, W, _ = frames.shape
        flows = np.zeros((T, H, W, 2), np.float32)
        if T == 1:
            return flows
        flow_fn = self._get_flow()
        n = T - 1
        for start in range(0, n, chunk):
            end = min(start + chunk, n)
            curr = frames[1 + start : 1 + end]
            prev = frames[start:end]
            if end - start < chunk:  # pad to fixed batch for compile reuse
                pad = chunk - (end - start)
                curr = np.concatenate([curr, np.repeat(curr[-1:], pad, 0)], 0)
                prev = np.concatenate([prev, np.repeat(prev[-1:], pad, 0)], 0)
            out = np.asarray(flow_fn(self.tfn_vars, jnp.asarray(curr), jnp.asarray(prev)))
            flows[1 + start : 1 + end] = out[: end - start]
        return flows

    @staticmethod
    def _unpack_labels(est_np: np.ndarray, W: int) -> np.ndarray:
        """Invert the on-device trit/2-bit/4-bit label packing to (.., H, W)."""
        if est_np.shape[-1] == W:
            return est_np
        if est_np.shape[-1] == (W + 4) // 5:  # base-3, K <= 3
            n, b, h, wp = est_np.shape
            lab = np.empty((n, b, h, wp * 5), np.uint8)
            v = est_np
            for i in range(5):
                lab[..., i::5] = v % 3
                v = v // 3
            return lab[..., :W]
        if est_np.shape[-1] == (W + 3) // 4:  # 2-bit, K <= 4
            n, b, h, wp = est_np.shape
            lab = np.empty((n, b, h, wp * 4), np.uint8)
            lab[..., 0::4] = est_np & 0x03
            lab[..., 1::4] = (est_np >> 2) & 0x03
            lab[..., 2::4] = (est_np >> 4) & 0x03
            lab[..., 3::4] = est_np >> 6
            return lab[..., :W]
        n, b, h, wp = est_np.shape  # 4-bit, K <= 16
        lab = np.empty((n, b, h, wp * 2), np.uint8)
        lab[..., 0::2] = est_np & 0x0F
        lab[..., 1::2] = est_np >> 4
        return lab[..., :W]

    def _chunk_plan(self, n_steps: int):
        """Chunk sizes for a video: full chunks, then a tapered tail.

        The LAST chunk's label download cannot overlap any compute, so a
        full-size final chunk exposes its whole transfer (~170 ms for 16
        480p frames over a ~10 MB/s link). Tapering the tail to C/4-sized
        chunks cuts that exposure 4x for one extra compiled size.
        """
        C = self.chunk
        small = max(1, C // 4)
        plan = []
        left = n_steps
        while left > C:
            plan.append(C)
            left -= C
        if left == n_steps and left <= C:
            return [C]  # short video: one (padded) chunk, nothing to hide
        while left > 0:
            plan.append(small)
            left -= small
        return plan

    def _video_flags(self, n_objects: np.ndarray, T: int):
        any_new = np.zeros((T,), bool)
        any_new[1:] = n_objects[1:] != n_objects[:-1]
        in_to_mem = np.array([(t % self.memorize_every) == 0 for t in range(T)])
        commit = in_to_mem | any_new
        return any_new, commit

    def _acc_update_fn(self, size: int, flip: bool, out_hw: Tuple[int, int]):
        """Jitted on-device TTA accumulation: optional LR un-flip + resize
        back to the 1.0-scale grid + acc[t0:t0+size] += probs. The acc buffer
        is DONATED, so every multi-scale/flip pass stays on device and only
        the final averaged tensor is downloaded once (the reference streams
        each pass's full f32 probabilities to the host instead,
        utils/helpers.py:44-78 — T*K*H*W*4 bytes per pass)."""
        key = ("acc", size, flip, out_hw)
        if key not in self._chunk_fns:

            @functools.partial(jax.jit, donate_argnums=(0,))
            def acc_update(acc, est, t0):
                est = est[:, 0].astype(jnp.float32)  # (size, K, hs, ws)
                if flip:
                    est = est[..., ::-1]
                if est.shape[-2:] != out_hw:
                    est = resize_bilinear(
                        est, out_hw, spatial_axes=(-2, -1), align_corners=False
                    )
                cur = jax.lax.dynamic_slice(
                    acc, (t0, 0, 0, 0), (size,) + acc.shape[1:]
                )
                return jax.lax.dynamic_update_slice(
                    acc, cur + est, (t0, 0, 0, 0)
                )

            self._chunk_fns[key] = acc_update
        return self._chunk_fns[key]

    def _run(
        self,
        frames: np.ndarray,
        masks: np.ndarray,
        n_objects: np.ndarray,
        flows: Optional[np.ndarray],
        return_probs: bool,
        accumulate_into=None,   # (acc, flip, out_hw): on-device TTA pass
        lengths: Optional[np.ndarray] = None,  # (N,) true lengths (ragged)
    ):
        # Single video: frames (T, H, W, 3). Multi-stream serving: frames
        # (N, T, H, W, 3) — N videos advance through ONE compiled chunk
        # program as the model batch dim. Measured 480p curve
        # (docs/PERFORMANCE.md): the step is HBM-bound, so batching peaks at
        # N=2 (+5% aggregate) and LOSES throughput at N>=4 — use N>1 for
        # small-frame workloads or the last few farm percent. Videos sharing
        # one commit/any_new schedule ride the scalar-cursor program (one
        # shared lax.cond bank write); mixed schedules or ragged lengths
        # switch to the per-stream path — (B,) cursor, per-stream
        # commit/any_new/step_valid vectors, batched one-slot ring scatter
        # (models/rmnet.py step(), per_stream mode).
        multi = frames.ndim == 5
        if not multi:
            frames = frames[None]
            masks = masks[None]
            n_objects = np.asarray(n_objects)[None]
            if flows is not None:
                flows = flows[None]
        N, T, K, H, W = masks.shape
        n_objects = np.asarray(n_objects)
        if lengths is None:
            lengths = np.full((N,), T, np.int64)
        else:
            lengths = np.asarray(lengths)
        n_max = np.max(n_objects, axis=1)  # (N,)
        obj_valid = jnp.asarray(
            (np.arange(K)[None] >= 1) & (np.arange(K)[None] <= n_max[:, None])
        )
        flags = [self._video_flags(n_objects[i], T) for i in range(N)]
        # zero the flags past each stream's true length (masked out by
        # step_valid anyway; keeps the capacity count and schedule
        # comparison honest)
        for i in range(N):
            flags[i][0][lengths[i]:] = False
            flags[i][1][lengths[i]:] = False
        any_new, commit = flags[0]
        per_stream = int(np.min(lengths)) != T or any(
            not (np.array_equal(any_new, a) and np.array_equal(commit, c))
            for a, c in flags[1:]
        )
        capacity = max(
            self._capacity_for(int(lengths[i]), flags[i][1]) for i in range(N)
        )
        if per_stream:
            any_new_tm = np.stack([a for a, _ in flags], axis=1)  # (T, N)
            commit_tm = np.stack([c for _, c in flags], axis=1)   # (T, N)

        # time-major layout: chunk slicing/padding stays axis-0 for any N
        frames = np.moveaxis(frames, 0, 1)          # (T, N, H, W, 3)
        masks = np.moveaxis(masks, 0, 1)            # (T, N, K, H, W)
        if flows is not None:
            flows = np.moveaxis(flows, 0, 1)        # (T, N, H, W, 2)

        state = self.apply.init_state(
            jnp.asarray(frames[0].astype(np.float32)),
            jnp.asarray(masks[0].astype(np.float32)),
            capacity=capacity,
            dtype=self.dtype,
            per_stream_cursor=per_stream,
        )
        chunk_fn = self._get_chunk_fn(use_tfn_flow=flows is None,
                                      return_probs=return_probs,
                                      capacity=capacity)

        if accumulate_into is not None:
            assert not multi, "TTA accumulation is a single-video path"
            acc, flip, out_hw = accumulate_into
            out = None
        elif return_probs:
            out = np.zeros((T, N, K, H, W), np.float32)
            out[0] = masks[0]
        else:
            out = np.zeros((T, N, H, W), np.uint8)
            out[0] = np.argmax(masks[0], axis=1)

        def pad_tail(a, n):
            return np.concatenate([a, np.repeat(a[-1:], n, 0)], 0) if n else a

        def materialize(pending):
            est, p_t, p_end = pending
            est_np = np.asarray(est)
            if not return_probs:
                est_np = self._unpack_labels(est_np, W)
            out[p_t:p_end] = est_np[: p_end - p_t]

        pending = None
        t = 1
        for size in self._chunk_plan(T - 1):
            if t >= T:
                break
            end = min(t + size, T)
            n_pad = size - (end - t)
            f_c = pad_tail(frames[t:end].astype(np.float32), n_pad)
            g_c = pad_tail(masks[t:end], n_pad)
            if per_stream:
                new_c = pad_tail(any_new_tm[t:end], n_pad)           # (C, N)
                com_c = pad_tail(commit_tm[t - 1 : end - 1], n_pad)  # (C, N)
                # step s live for stream i iff frame s exists in video i
                valid_c = (t + np.arange(size))[:, None] < lengths[None, :]
            else:
                new_c = pad_tail(any_new[t:end], n_pad)
                com_c = pad_tail(commit[t - 1 : end - 1], n_pad)
                valid_c = np.arange(size) < (end - t)
            args = [
                self.rmnet_vars, self.tfn_vars, state,
                jnp.asarray(f_c), jnp.asarray(g_c), jnp.asarray(new_c),
                jnp.asarray(com_c), jnp.asarray(valid_c), obj_valid,
            ]
            if flows is not None:
                fl_c = pad_tail(flows[t:end].astype(np.float32), n_pad)
                args.append(jnp.asarray(fl_c))
            state, est = chunk_fn(*args)
            if accumulate_into is not None:
                # on-device TTA: fold this chunk into the donated accumulator
                # (no host download at all during the pass)
                acc = self._acc_update_fn(size, flip, out_hw)(
                    acc, est, jnp.asarray(t, jnp.int32)
                )
                t = end
                continue
            try:  # start the device->host copy in the background
                est.copy_to_host_async()
            except Exception:
                pass
            # download the PREVIOUS chunk's result while this one computes
            if pending is not None:
                materialize(pending)
            pending = (est, t, end)
            t = end
        if accumulate_into is not None:
            return acc
        if pending is not None:
            materialize(pending)
        # out is time-major (T, N, ...): videos-major for multi, squeezed
        # back to the single-video shapes otherwise
        return np.moveaxis(out, 0, 1) if multi else out[:, 0]

    def run_video_labels(
        self,
        frames: np.ndarray,        # (T, H, W, 3) normalized float32
        masks: np.ndarray,         # (T, K, H, W) gt one-hot (frame 0 required)
        n_objects: np.ndarray,     # (T,) int
        flows: Optional[np.ndarray] = None,  # None -> TinyFlowNet inside the scan
    ) -> np.ndarray:
        """Fast path: returns (T, H, W) uint8 argmax labels."""
        return self._run(frames, masks, n_objects, flows, return_probs=False)

    def run_video(
        self,
        frames: np.ndarray,
        masks: np.ndarray,
        n_objects: np.ndarray,
        flows: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Full path: returns est_masks (T, K, H, W) float32 probabilities."""
        return self._run(frames, masks, n_objects, flows, return_probs=True)

    def run_videos_labels(
        self,
        frames: np.ndarray,        # (N, T, H, W, 3) normalized float32
        masks: np.ndarray,         # (N, T, K, H, W) gt one-hot (frame 0 required)
        n_objects: np.ndarray,     # (N, T) int
        flows: Optional[np.ndarray] = None,  # (N, T, H, W, 2) or None
    ) -> np.ndarray:
        """Multi-stream serving: N equal-length videos through ONE compiled
        chunk program, batched on the model's batch axis. Returns
        (N, T, H, W) uint8 labels.

        Measured 480p curve (docs/PERFORMANCE.md): the step is HBM-bound,
        so batching peaks at N=2 (+5% aggregate device FPS) and loses
        throughput at N>=4 — size N accordingly (small frames benefit
        more). The reference serves strictly one video at a time
        (core/test.py:59-118). Videos sharing one commit/any_new schedule
        ride the scalar-cursor program; mixed schedules switch to the
        per-stream (B,)-cursor path automatically. For videos of DIFFERENT
        lengths use :meth:`run_video_batch`."""
        return self._run(frames, masks, n_objects, flows, return_probs=False)

    def run_video_batch(
        self,
        videos,                       # sequence of (frames, masks, n_objects)
                                      #   or (frames, masks, n_objects, flows)
        return_probs: bool = False,
    ):
        """Ragged multi-stream serving: videos of DIFFERENT lengths, object
        counts, and commit schedules batched through one compiled chunk
        program. Returns a list of per-video outputs at each video's true
        length ((T_i, H, W) uint8 labels, or (T_i, K_max, H, W) float32
        probabilities with ``return_probs``).

        Shorter videos are padded to the longest and FROZEN past their last
        frame (per-stream step_valid); each stream commits on its own
        schedule via the (B,)-cursor ring bank. All videos must share the
        frame size; masks are zero-padded to the largest K. Matches the
        reference's per-video semantics (models/rmnet.py:404-426) exactly —
        pinned by tests/test_engine_multistream.py mixed-set parity.
        """
        vids = [tuple(v) for v in videos]
        if not vids:
            return []
        has_flows = len(vids[0]) >= 4 and vids[0][3] is not None
        if any((len(v) >= 4 and v[3] is not None) != has_flows for v in vids):
            raise ValueError(
                "run_video_batch: either every video carries precomputed "
                "flows or none does (TinyFlowNet-in-scan vs fed flows are "
                "different programs)"
            )
        H, W = vids[0][0].shape[1:3]
        if any(v[0].shape[1:3] != (H, W) for v in vids):
            raise ValueError(
                "run_video_batch: all videos must share the frame size; "
                "group by resolution (DAVIS 480p is uniform)"
            )
        N = len(vids)
        lengths = np.array([v[0].shape[0] for v in vids])
        T = int(lengths.max())
        K = max(v[1].shape[1] for v in vids)

        def pad_t(a, T_i):
            return (np.concatenate([a, np.repeat(a[-1:], T - T_i, 0)], 0)
                    if T_i < T else a)

        frames = np.stack([pad_t(v[0], l) for v, l in zip(vids, lengths)])
        masks = np.stack([
            pad_t(np.pad(v[1], ((0, 0), (0, K - v[1].shape[1]), (0, 0), (0, 0))), l)
            for v, l in zip(vids, lengths)
        ])
        n_objects = np.stack([
            pad_t(np.asarray(v[2]), l) for v, l in zip(vids, lengths)
        ])
        flows = None
        if has_flows:
            flows = np.stack([pad_t(v[3], l) for v, l in zip(vids, lengths)])

        out = self._run(frames, masks, n_objects, flows,
                        return_probs=return_probs, lengths=lengths)
        return [out[i, : lengths[i]] for i in range(N)]

    def run_videos(
        self,
        frames: np.ndarray,
        masks: np.ndarray,
        n_objects: np.ndarray,
        flows: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Multi-stream probability path: (N, T, K, H, W) float32."""
        return self._run(frames, masks, n_objects, flows, return_probs=True)

    def run_video_raw(
        self,
        frames_u8: np.ndarray,   # (T, H, W, 3) uint8 RGB
        gt_labels: np.ndarray,   # (T, H, W) uint8 label maps (255 = ignore)
        n_objects: np.ndarray,   # (T,) int
        n_slots: Optional[int] = None,
    ) -> np.ndarray:
        """Raw-input fast path: normalization and one-hot happen ON DEVICE,
        cutting per-frame host uploads ~4x (uint8 frames + label maps instead
        of float frames + one-hot masks). Returns (T, H, W) uint8 labels."""
        T, H, W, _ = frames_u8.shape
        K = n_slots or (int(np.max(n_objects)) + 1)
        n_max = int(np.max(n_objects))
        obj_valid = jnp.asarray(((np.arange(K) >= 1) & (np.arange(K) <= n_max))[None])
        any_new, commit = self._video_flags(n_objects, T)
        capacity = self._capacity_for(T, commit)

        mean = np.asarray(self.cfg.CONST.DATASET_MEAN, np.float32)
        std = np.asarray(self.cfg.CONST.DATASET_STD, np.float32)
        frame0 = (frames_u8[0].astype(np.float32) / 255.0 - mean) / std
        masks0 = np.stack([(gt_labels[0] == k) for k in range(K)]).astype(np.float32)
        state = self.apply.init_state(
            jnp.asarray(frame0[None]), jnp.asarray(masks0[None]),
            capacity=capacity, dtype=self.dtype,
        )
        chunk_fn = self._get_chunk_fn(
            use_tfn_flow=True, return_probs=False, raw_inputs=True, n_slots=K,
            capacity=capacity,
        )

        out = np.zeros((T, H, W), np.uint8)
        out[0] = np.where(gt_labels[0] == 255, 0, gt_labels[0])

        def pad_tail(a, n):
            return np.concatenate([a, np.repeat(a[-1:], n, 0)], 0) if n else a

        def materialize(pending):
            est, p_t, p_end = pending
            est_np = self._unpack_labels(np.asarray(est), W)
            out[p_t:p_end] = est_np[: p_end - p_t, 0]

        pending = None
        t = 1
        for size in self._chunk_plan(T - 1):
            if t >= T:
                break
            end = min(t + size, T)
            n_pad = size - (end - t)
            state, est = chunk_fn(
                self.rmnet_vars, self.tfn_vars, state,
                jnp.asarray(pad_tail(frames_u8[t:end], n_pad)[:, None]),
                jnp.asarray(pad_tail(gt_labels[t:end], n_pad)[:, None]),
                jnp.asarray(pad_tail(any_new[t:end], n_pad)),
                jnp.asarray(pad_tail(commit[t - 1 : end - 1], n_pad)),
                jnp.asarray(np.arange(size) < (end - t)),
                obj_valid,
            )
            try:
                est.copy_to_host_async()
            except Exception:
                pass
            if pending is not None:
                materialize(pending)
            pending = (est, t, end)
            t = end
        if pending is not None:
            materialize(pending)
        return out

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
        single = tuple(cfg.TEST.FRAME_SCALES) == (1.0,) and not cfg.TEST.FLIP_LR
        if single:
            # no averaging needed: use the labels fast path for the probs too
            est = self.run_video(frames, masks, n_objects)
            return None, est

        # on-device accumulation (VERDICT r3 #7): every pass folds its probs
        # into ONE donated device buffer (un-flip + resize back on device);
        # only the final averaged tensor crosses the host link. Frames 1..
        # accumulate; frame 0 is the shared ground truth. The buffer carries
        # a few spare tail rows so the tapered last chunk's padded frames
        # land harmlessly past row T-1.
        T_rows = 1 + sum(self._chunk_plan(T - 1))
        acc = jnp.zeros((max(T_rows, T), K, H, W), jnp.float32)
        n_passes = 0
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
            acc = self._run(f_s, m_s, n_objects, fl_s, return_probs=True,
                            accumulate_into=(acc, False, (H, W)))
            n_passes += 1
            if flows_out is None:
                if fs != 1.0:
                    flows_out = np.asarray(
                        resize_bilinear(jnp.asarray(fl_s), (H, W),
                                        align_corners=False)
                    ) / fs
                else:
                    flows_out = fl_s

            if cfg.TEST.FLIP_LR:
                f_f = f_s[:, :, ::-1].copy()
                m_f = m_s[:, :, :, ::-1].copy()
                fl_f = fl_s[:, :, ::-1].copy()
                fl_f[..., 0] = -fl_f[..., 0]
                acc = self._run(f_f, m_f, n_objects, fl_f, return_probs=True,
                                accumulate_into=(acc, True, (H, W)))
                n_passes += 1
        probs = np.asarray(acc[:T]) / n_passes  # the ONE prob download
        probs[0] = masks[0]
        return flows_out, probs


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
