"""End-to-end streaming VOS benchmark on the attached accelerator.

Measures 480p multi-object streaming inference FPS/chip: the full per-frame
pipeline (TinyFlowNet flow + memorize + regional memory read + decode) as
chunked lax.scan dispatches with device-resident weights and state. Inputs
are staged to HBM before timing so the number reflects the chip, not the
host link; label outputs are downloaded inside the timed region.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

Baseline: the RMNet paper reports ~12 FPS for 480p DAVIS inference on a
V100-class GPU (arXiv:2103.12934; BASELINE.md) — vs_baseline = fps / 12.
"""

import json
import os
import sys
import time

import numpy as np

# v5e-class peak (must match bench_train.py)
_PEAK_FLOPS = {"bf16": 197e12, "f32": 98.5e12}


def _emit_error(stage, diag):
    """Final-failure path: ONE parseable JSON line (never a stack trace).

    The driver records the tail of this process; a structured line makes a
    wedged-tunnel round diagnosable and lets transient failures self-heal
    via the retry loop that precedes this call.
    """
    print(json.dumps({
        "metric": "480p streaming VOS inference (error)",
        "value": None,
        "unit": "fps",
        "vs_baseline": None,
        "error": f"{stage}: {diag}"[:2000],
    }))


def _probe_backend(retries=None, probe_timeout=None, backoff=None):
    """Bounded-deadline accelerator probe in a SUBPROCESS, with retries.

    The tunneled TPU backend can hang indefinitely at init when the relay
    is wedged (docs/PERFORMANCE.md; round-3 incident) — an in-process
    ``jax.devices()`` would hang bench.py itself. A subprocess probe with a
    deadline is safe to kill (init, not mid-compile). Retries with backoff
    let a transiently-busy single-tenant tunnel self-heal.

    Returns (ok, diag).
    """
    import subprocess

    retries = retries or int(os.environ.get("BENCH_PROBE_RETRIES", "3"))
    probe_timeout = probe_timeout or int(
        os.environ.get("BENCH_PROBE_TIMEOUT", "150"))
    backoff = backoff if backoff is not None else int(
        os.environ.get("BENCH_PROBE_BACKOFF", "90"))

    diag = "unknown"
    for attempt in range(retries):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; d = jax.devices(); print(d[0].platform, len(d))"],
                capture_output=True, text=True, timeout=probe_timeout,
            )
            if r.returncode == 0:
                return True, r.stdout.strip()
            tail = (r.stderr or r.stdout or "").strip().splitlines()
            diag = tail[-1] if tail else f"probe rc={r.returncode}"
        except subprocess.TimeoutExpired:
            diag = (f"backend probe timed out after {probe_timeout}s "
                    "(single-tenant tunnel busy or wedged)")
        if attempt < retries - 1:
            time.sleep(backoff * (attempt + 1))
    return False, diag


def _measure_engine(engine, staged, f0, m0, obj_valid, T, CHUNK, dtype,
                    want_flops=True, trace=False):
    """Round-3 methodology on ONE engine config: compile+warm, median-of-5
    e2e (background label downloads), dedicated device-only warmup, then
    median-of-5 device-only (1-element final sync). Shared by the dense and
    flash passes so both ride identical staging and estimator policy."""
    import jax

    chunk_fn = engine._get_chunk_fn(use_tfn_flow=True, return_probs=False)
    _copy = jax.jit(lambda a: a + 0)

    def _fresh_state():
        # copy m0 too: its astype is a no-op (alias) on the --f32 path
        return engine.apply.init_state(_copy(f0), _copy(m0),
                                       capacity=engine.capacity, dtype=dtype)

    def run_once():
        state = _fresh_state()
        outs = []
        pending = None
        for f_c, g_c, new_c, com_c, valid_c, n_live in staged:
            state, est = chunk_fn(
                engine.rmnet_vars, engine.tfn_vars, state,
                f_c, g_c, new_c, com_c, valid_c, obj_valid
            )
            try:  # start the device->host copy in the background
                est.copy_to_host_async()
            except Exception:
                pass
            # download the previous chunk's labels while this one computes
            if pending is not None:
                outs.append(np.asarray(pending[0])[: pending[1], 0])
            pending = (est, n_live)
        outs.append(np.asarray(pending[0])[: pending[1], 0])
        return outs

    def run_device_only():
        """Chip-side pipeline only: chained chunks, 1-element final sync.

        The e2e number includes streaming every label map over the host
        link — on this dev box an ~8 MB/s tunnel that is NOT representative
        of real v5e host IO. device_fps is the chip + dispatch capability.
        """
        state = _fresh_state()
        last = None
        for f_c, g_c, new_c, com_c, valid_c, n_live in staged:
            state, last = chunk_fn(
                engine.rmnet_vars, engine.tfn_vars, state,
                f_c, g_c, new_c, com_c, valid_c, obj_valid
            )
        np.asarray(last.ravel()[:1])  # tunnel-safe device sync
        return last

    # compiled-cost introspection for the MFU estimate (best effort):
    # FLOPs of one steady-state chunk program / frames-per-chunk
    flops_per_frame = None
    if want_flops:
        try:
            f_c, g_c, new_c, com_c, valid_c, _ = staged[0]
            lowered = chunk_fn.lower(
                engine.rmnet_vars, engine.tfn_vars, _fresh_state(),
                f_c, g_c, new_c, com_c, valid_c, obj_valid,
            )
            flops_per_frame = (
                float(lowered.compile().cost_analysis()["flops"]) / CHUNK
            )
        except Exception:
            pass

    run_once()  # compile + warm
    # 5 measured passes. The host<->device link can stall for hundreds of
    # ms at a time (downward outliers only), so best-of-N reflects the
    # chip pipeline's steady state; the median is reported alongside as
    # the conservative estimator.
    from rmnet_tpu.utils.profiling import trace_if

    import contextlib

    fps_runs = []
    labels_out = None
    ctx = trace_if() if trace else contextlib.nullcontext()
    with ctx:  # RMNET_TRACE_DIR=<dir> captures a profiler trace
        for _ in range(5):
            tic = time.perf_counter()
            labels_out = run_once()
            toc = time.perf_counter()
            fps_runs.append((T - 1) / (toc - tic))

    # device-only path: dedicated warmup (its program differs from run_once —
    # no per-chunk downloads — so the first call pays residual compile /
    # staging and was a 2.5x outlier inside best-of-3 in round 2), then
    # median-of-5 with best alongside, same estimator policy as e2e.
    run_device_only()
    dev_runs = []
    for _ in range(5):
        tic = time.perf_counter()
        run_device_only()
        dev_runs.append((T - 1) / (time.perf_counter() - tic))
    return {
        "fps_runs": fps_runs,
        "dev_runs": dev_runs,
        "flops_per_frame": flops_per_frame,
        "labels_out": labels_out,
    }


def main():
    import jax
    import jax.numpy as jnp

    from rmnet_tpu.config import Config
    from rmnet_tpu.core.engine import InferenceEngine, build_models

    t_start = time.perf_counter()
    bf16 = "--f32" not in sys.argv
    T = int(os.environ.get("BENCH_FRAMES", "48"))
    # BENCH_HW: smoke-test override ("H,W"); the headline number is 480p
    H, W = map(int, os.environ.get("BENCH_HW", "480,854").split(","))
    K = int(os.environ.get("BENCH_OBJECTS", "2")) + 1  # slots incl. background
    CHUNK = int(os.environ.get("BENCH_CHUNK", "16"))  # measured optimum (docs/PERFORMANCE.md)

    cfg = Config()
    cfg.TEST.MEMORY_CAPACITY = max(T // cfg.TEST.MEMORIZE_EVERY + 2, 4)

    dtype = jnp.bfloat16 if bf16 else jnp.float32
    _, _, rm_vars, tfn_vars = build_models(cfg, 0, dtype=None)
    engine = InferenceEngine(cfg, rm_vars, tfn_vars, dtype=dtype, chunk=CHUNK)

    rs = np.random.RandomState(0)
    frames = rs.rand(T, H, W, 3).astype(np.float32) * 2 - 1
    labels = np.zeros((T, H, W), np.uint8)
    for t in range(T):
        y = 100 + 2 * t
        labels[t, y:y + 120, 150:300] = 1
        if K > 2:
            labels[t, y + 40:y + 180, 450:620] = 2
    masks = np.stack([(labels == k) for k in range(K)], 1).astype(np.uint8)
    n_objects = np.full((T,), K - 1, np.int32)

    # ---- stage all chunk inputs in HBM up front
    any_new, commit = engine._video_flags(n_objects, T)
    obj_valid = jnp.asarray(((np.arange(K) >= 1) & (np.arange(K) <= K - 1))[None])

    staged = []
    staged_np = []  # host twins (frames, masks) for the multistream restage
    t = 1
    for size in engine._chunk_plan(T - 1):  # tapered tail hides the last download
        if t >= T:
            break
        end = min(t + size, T)
        n_pad = size - (end - t)

        def pad_tail(a):
            return np.concatenate([a, np.repeat(a[-1:], n_pad, 0)], 0) if n_pad else a

        f_np = pad_tail(frames[t:end])[:, None]
        g_np = pad_tail(masks[t:end]).astype(np.float32)[:, None]
        staged_np.append((f_np, g_np))
        staged.append((
            jax.device_put(f_np),
            jax.device_put(g_np),
            jax.device_put(pad_tail(any_new[t:end])),
            jax.device_put(pad_tail(commit[t - 1:end - 1])),
            jax.device_put(np.arange(size) < (end - t)),
            end - t,
        ))
        t = end

    # first frame + mask staged to HBM like every other input (uploading
    # 6 MB of f32 through the tunnel costs ~215 ms per pass otherwise).
    # frame0 passes into the DONATED state unchanged, so each pass works on
    # a device-side copy of the staged buffer.
    f0 = jax.device_put(frames[None, 0])
    m0 = jax.device_put(masks[None, 0].astype(np.float32))

    dense = _measure_engine(engine, staged, f0, m0, obj_valid, T, CHUNK,
                            dtype, want_flops=True, trace=True)
    fps_runs = dense["fps_runs"]
    dev_runs = dense["dev_runs"]
    flops_per_frame = dense["flops_per_frame"]
    labels_out = dense["labels_out"]
    fps = max(fps_runs)
    fps_median = float(np.median(fps_runs))
    device_fps = float(np.median(dev_runs))
    device_fps_best = max(dev_runs)

    # ---- block-sparse flash read, same staging + methodology (VERDICT r3:
    # report dense AND flash from one driver run). Guarded so it can never
    # cost the dense result: skipped on CPU, on BENCH_FLASH=0, or when the
    # dense pass already spent the deadline; failures land in flash_error.
    flash_metrics = {}
    deadline = float(os.environ.get("BENCH_FLASH_DEADLINE", "1500"))
    if os.environ.get("BENCH_FLASH", "1") == "1" and (
            jax.default_backend() != "cpu"
            # CPU structural smoke (engine falls back to dense internally)
            or os.environ.get("BENCH_FORCE_FLASH") == "1"):
        if time.perf_counter() - t_start > deadline:
            flash_metrics["flash_error"] = (
                f"skipped: dense pass exceeded {deadline:.0f}s deadline")
        else:
            try:
                fengine = InferenceEngine(cfg, rm_vars, tfn_vars, dtype=dtype,
                                          chunk=CHUNK,
                                          use_flash_attention=True)
                fm = _measure_engine(fengine, staged, f0, m0, obj_valid, T,
                                     CHUNK, dtype, want_flops=False)
                flash_metrics = {
                    "flash_fps": round(float(np.median(fm["fps_runs"])), 3),
                    "flash_fps_best": round(max(fm["fps_runs"]), 3),
                    "flash_runs": [round(f, 2) for f in fm["fps_runs"]],
                    "flash_device_fps": round(
                        float(np.median(fm["dev_runs"])), 3),
                    "flash_device_fps_best": round(max(fm["dev_runs"]), 3),
                    "flash_device_runs": [round(f, 2) for f in fm["dev_runs"]],
                }
            except Exception as ex:
                flash_metrics["flash_error"] = repr(ex)[:500]

    # ---- multi-stream aggregate throughput at the measured-best N
    # (round-4 curve, docs/PERFORMANCE.md: N=2 is the knee — the 480p step
    # is HBM-bound, so batching streams buys only a few percent and N>=4
    # LOSES throughput; this records the curve's peak driver-side).
    # Same methodology: staged HBM inputs, dedicated warmup, median-of-5
    # device-only, 1-element sync. Guarded like the flash pass.
    ms_metrics = {}
    N_ms = int(os.environ.get("BENCH_MS_STREAMS", "2"))
    if N_ms > 1 and os.environ.get("BENCH_MS", "1") == "1" and (
            jax.default_backend() != "cpu"):
        if time.perf_counter() - t_start > deadline:
            ms_metrics["multistream_error"] = (
                f"skipped: earlier passes exceeded {deadline:.0f}s deadline")
        else:
            try:
                msengine = InferenceEngine(
                    cfg, rm_vars, tfn_vars, dtype=dtype, chunk=CHUNK,
                    use_flash_attention=(
                        "flash_fps" in flash_metrics or None),
                )
                obj_valid_ms = jnp.asarray(np.broadcast_to(
                    (np.arange(K) >= 1) & (np.arange(K) <= K - 1),
                    (N_ms, K)).copy())
                staged_ms = [
                    (
                        jax.device_put(np.broadcast_to(
                            f_np, (f_np.shape[0], N_ms) + f_np.shape[2:]).copy()),
                        jax.device_put(np.broadcast_to(
                            g_np, (g_np.shape[0], N_ms) + g_np.shape[2:]).copy()),
                        new_c, com_c, valid_c, n_live,
                    )
                    for (f_np, g_np), (_, _, new_c, com_c, valid_c, n_live)
                    in zip(staged_np, staged)
                ]
                f0_ms = jax.device_put(np.broadcast_to(
                    frames[None, 0], (N_ms, H, W, 3)).copy())
                m0_ms = jax.device_put(np.broadcast_to(
                    masks[None, 0].astype(np.float32), (N_ms, K, H, W)).copy())
                msm = _measure_engine(msengine, staged_ms, f0_ms, m0_ms,
                                      obj_valid_ms, T, CHUNK, dtype,
                                      want_flops=False)
                agg = [N_ms * r for r in msm["dev_runs"]]
                ms_metrics = {
                    "multistream_streams": N_ms,
                    "multistream_agg_fps": round(float(np.median(agg)), 3),
                    "multistream_agg_fps_best": round(max(agg), 3),
                    "multistream_agg_runs": [round(f, 2) for f in agg],
                    "multistream_agg_fps_e2e": round(
                        float(np.median([N_ms * r for r in msm["fps_runs"]])), 3),
                }
            except Exception as ex:
                ms_metrics["multistream_error"] = repr(ex)[:500]

    total = np.concatenate(labels_out, axis=0)
    # labels come back packed: 5 px/byte (K<=3), 4 px/byte (K<=4), 2 (K<=16)
    assert total.shape in (
        (T - 1, H, W), (T - 1, H, W // 2), (T - 1, H, (W + 3) // 4),
        (T - 1, H, (W + 4) // 5),
    )
    assert total.dtype == np.uint8

    print(json.dumps({
        "metric": "480p streaming VOS inference (2 objects, memorize_every=5, "
                  f"{'bf16' if bf16 else 'f32'}, chunk={CHUNK})",
        "value": round(fps_median, 3),
        "unit": "fps",
        "vs_baseline": round(fps_median / 12.0, 3),
        "best_of_5": round(fps, 3),
        "runs": [round(f, 2) for f in fps_runs],
        # chip+dispatch capability, label download excluded (the dev-box
        # tunnel moves ~8 MB/s; real v5e host IO is GB/s)
        "device_fps": round(device_fps, 3),
        "device_fps_best": round(device_fps_best, 3),
        "device_runs": [round(f, 2) for f in dev_runs],
        # chip-efficiency estimate: compiled-cost FLOPs per frame (XLA
        # cost model) x achieved frame rate / chip peak
        "flops_per_frame": flops_per_frame,
        "est_mfu": (
            round(flops_per_frame * fps_median
                  / _PEAK_FLOPS["bf16" if bf16 else "f32"], 4)
            if flops_per_frame else None
        ),
        "est_mfu_device": (
            round(flops_per_frame * device_fps
                  / _PEAK_FLOPS["bf16" if bf16 else "f32"], 4)
            if flops_per_frame else None
        ),
        **flash_metrics,
        **ms_metrics,
    }))


if __name__ == "__main__":
    ok, diag = _probe_backend()
    if not ok:
        _emit_error("backend-init", diag)
        sys.exit(1)
    try:
        main()
    except Exception as ex:
        _emit_error("bench", repr(ex))
        sys.exit(1)
