"""Per-video driver + headless batch runner.

The TPU counterpart of the reference's ``process_video`` / ``run_headless``
(FunscriptFlow.pyw:1094-1404, 2606-2638): decode streams on a prefetch
thread, frame windows flow through one compiled device program
(models.pipeline), per-pair scalars accumulate on host, and the whole-video
signal chain emits the funscript.

Behavioral deltas from the reference, each deliberate and documented:

* chunk-boundary pairs are computed and center smoothing crosses chunk
  edges (reference defect, SURVEY.md §5);
* a video with < 2 sampled frames logs an error instead of crashing
  (reference would IndexError at :1268);
* decode is sequential, not seek-per-frame (io.decode docstring).

Failure semantics match: per-video isolation — any error logs and moves on,
aggregated into the returned ``error_occurred`` flag (:1115-1125); cancel is
polled between device batches (:1146-1148).
"""

from __future__ import annotations

import os
import time

import numpy as np

from .io import checkpoint as ckpt_mod
from .io import decode as iodec
from .io.funscript import funscript_path, write_funscript
from .models.pipeline import (PipelineConfig, StreamingFlowAnalyzer,
                              flow_chunk_program)
from .ops.reductions import CENTER_SMOOTH_RADIUS
from .ops import signal_host
from .ops.signal import DISCONTINUITY_THRESHOLD, signal_chain_device
from .utils.logging import StageTimers, profile_trace
from .utils.params import Params
from .utils.strings import STRINGS

__all__ = ["process_video", "run_headless", "compute_actions"]


# ~36 min of 30 fps samples: below this the exact host signal chain wins
# (sub-second) and avoids one device compile per new bucket length
AUTO_DEVICE_MIN_SAMPLES = 65536


def _bucket_length(n: int, minimum: int = 256) -> int:
    p = minimum
    while p < n:
        p *= 2
    return p


def compute_actions(dots, cuts, time_stamps, fps, effective_fps, params: Params,
                    log_func=lambda m: None, mesh=None):
    """Whole-video signal chain -> funscript actions.

    Window sizes derive from the effective fps (reference :1287, :1335).
    ``signal_backend='auto'`` runs the chain on the exact host path except
    for very long signals (>= AUTO_DEVICE_MIN_SAMPLES) that are clean of
    the cases the static-shape device path doesn't cover (cumulative-flow
    discontinuities — see ops.signal docstring). When a multi-device
    ``mesh`` is active, those long clean signals run the *distributed*
    time-axis-sharded chain (parallel.signal_sp) instead of one device —
    the flow windows were already sharded over the mesh, so the signal
    chain riding the same mesh keeps the whole video on-device end to end
    (SURVEY.md §2.4 SP row).
    """
    n = len(dots)
    detrend_win = int(params.detrend_window * effective_fps)
    norm_win = int(params.norm_window * effective_fps)

    backend = params.signal_backend
    if backend == "auto":
        # The host chain is exact (f64) and linear-time: ~5 s even for a
        # 3.7 h video. The device chain only pays for very long signals —
        # and each new power-of-two bucket length costs a device compile
        # (which made short-video folder batches pay seconds per new
        # length). Route small signals to host.
        if n < AUTO_DEVICE_MIN_SAMPLES or detrend_win < 2:
            backend = "host"
        else:
            cum = signal_host.integrate_flow(dots, cuts)
            clean = not (np.abs(np.diff(cum)) > DISCONTINUITY_THRESHOLD).any()
            if not clean:
                backend = "host"
            elif mesh is not None and int(mesh.devices.size) > 1 \
                    and n > detrend_win:
                backend = "sharded"
            else:
                backend = "device"

    if backend == "sharded":
        from .parallel.signal_sp import signal_chain_sharded
        from .utils.devsync import DEVICE_LOCK

        log_func(f"Signal chain: time-axis sharded over "
                 f"{int(mesh.devices.size)} devices ({n} samples).")
        with DEVICE_LOCK:
            norm, mask = signal_chain_sharded(
                np.asarray(dots, np.float32), np.asarray(cuts, bool), mesh,
                detrend_win, norm_win)
            norm = np.asarray(norm, dtype=np.float64)
            keep = np.asarray(mask)
    elif backend == "device":
        import jax.numpy as jnp

        from .utils.devsync import DEVICE_LOCK

        P = _bucket_length(n)
        dpad = np.zeros(P, np.float32)
        dpad[:n] = dots
        cpad = np.zeros(P, bool)
        cpad[:n] = cuts
        with DEVICE_LOCK:
            norm, mask = signal_chain_device(
                jnp.asarray(dpad), jnp.asarray(cpad), jnp.int32(n),
                detrend_win, norm_win
            )
            norm = np.asarray(norm, dtype=np.float64)[:n]
            keep = np.asarray(mask)[:n]
    else:
        return signal_host.signal_chain(
            dots, cuts, time_stamps, fps, detrend_win, norm_win,
            params.keyframe_reduction,
        )[0:2]

    if params.keyframe_reduction:
        idx = list(np.nonzero(keep)[0])
        if n == 1:
            idx = [0, 0]  # reference quirk (:1367,:1374)
    else:
        idx = range(n)
    actions = []
    for ki in idx:
        try:
            actions.append({
                "at": int((time_stamps[ki] / fps) * 1000),
                "pos": 100 - int(round(norm[ki])),
            })
        except Exception as e:
            log_func(f"Error computing action at segment index {ki}: {e}")
    return actions, norm


def _detect_native(params: Params, log_func):
    """Native runtime module, or None (logs when forced-on but missing)."""
    if params.use_native_decode not in ("auto", "on"):
        return None
    try:
        from . import runtime as _rt

        if _rt.available():
            return _rt
    except Exception as e:
        if params.use_native_decode == "on":
            log_func(f"ERROR: native decode requested but unavailable: {e}")
            return None
    if params.use_native_decode == "on":
        log_func("ERROR: native decode requested but unavailable")
    return None


# sub-norm-window clips route to the exact engine; shared with the
# checkpoint fingerprint's engine resolution (see the docstring there)
_effective_quality = iodec.effective_decode_quality


def _decode_shards(params: Params) -> int:
    """Decode shard count: ``threads`` clamped to host cores (more shards
    than cores only adds seek + contention). ``FF_TPU_FORCE_SHARDS=N``
    overrides the clamp — the escape hatch for measuring shard scaling on
    a box whose cgroup/core accounting confuses os.cpu_count (VERDICT r2
    asked for a way to produce a real shards-vs-throughput number)."""
    force = os.environ.get("FF_TPU_FORCE_SHARDS")
    if force:
        try:
            return max(1, int(force))
        except ValueError:
            pass
    return min(params.threads, os.cpu_count() or 1)


def _open_video(video_path, params: Params, cancel_flag, log_func):
    """One-open video setup: (meta, source), source None on hard error.

    The common path (native pump, threads <= 1) lets the pump self-probe —
    the sampling step derives from fps inside fp_open, and metadata comes
    back from the already-open decoder, saving the separate cv2 probe open
    (~0.1 s of per-clip critical path). Sharded decode still probes first
    (range splitting needs the sample count before workers open).
    """
    native_rt = _detect_native(params, log_func)
    if params.use_native_decode == "on" and native_rt is None:
        return None, None
    shards = _decode_shards(params)
    if native_rt is not None and shards <= 1:
        src = native_rt.NativeFrameSource(
            video_path, None, params.vr_mode, depth=params.batch_size,
            cancel_flag=cancel_flag, gray=True,
            fast=(params.decode_quality == "fast"),
        )
        meta = src.meta
        if src.is_fast and _effective_quality(meta, params) == "exact":
            # sub-norm-window clip: reopen on the exact engine (the clip is
            # seconds long, so the reopen + exact decode are both cheap)
            src.close()
            src = native_rt.NativeFrameSource(
                video_path, meta, params.vr_mode, depth=params.batch_size,
                cancel_flag=cancel_flag, gray=True, fast=False,
            )
        return meta, src
    meta = iodec.probe(video_path)
    return meta, _make_frame_source(video_path, meta, params, cancel_flag,
                                    log_func)


def _make_frame_source(video_path, meta, params: Params, cancel_flag, log_func,
                       start_sample: int = 0):
    """Decode source for one video: native (C++ frame_pump) when available,
    sharded over ``params.threads`` workers when threads > 1 (the reference's
    ``threads`` knob, :2644, remapped to range-parallel sequential decode).
    ``start_sample`` > 0 resumes mid-video (checkpoint path).
    Returns None on a hard error (native decode forced but unavailable).
    """
    native_rt = _detect_native(params, log_func)
    if params.use_native_decode == "on" and native_rt is None:
        return None
    fast = _effective_quality(meta, params) == "fast"

    def factory(start, count, depth):
        # production path ships grayscale (1/3 the H2D bytes; host BGR2GRAY
        # is bit-identical to the device conversion — tested)
        if native_rt is not None:
            return native_rt.NativeFrameSource(
                video_path, meta, params.vr_mode, depth=depth,
                cancel_flag=cancel_flag, start_sample=start, max_samples=count,
                gray=True, fast=fast,
            )
        return iodec.PrefetchingFrameSource(
            video_path, meta, params.vr_mode, depth=depth,
            cancel_flag=cancel_flag, start_sample=start, max_samples=count,
            gray=True,
        )

    n_samples = len(meta.sampled_indices)
    shards = _decode_shards(params)
    if start_sample > 0:
        # checkpoint resume: one sequential source from the resume point
        # (sharded range-splitting is a fresh-run optimization)
        return factory(start_sample, -1, params.batch_size)
    if shards > 1:
        return iodec.ShardedFrameSource(
            factory, n_samples, shards, depth=params.batch_size, gray=True,
            cancel_flag=cancel_flag,
        )
    return factory(0, -1, params.batch_size)


def _planned_tail_buckets(pair_batch: int, radius: int, n_pairs: int) -> list:
    """The non-full window bucket sizes StreamingFlowAnalyzer will dispatch
    for an ``n_pairs`` video under the runner's pull pattern (first pull =
    ``ramp_pairs + radius + 1`` frames, then ``pair_batch`` per pull;
    single-device path, total handed to the analyzer), excluding the full
    ``pair_batch`` window the main loop compiles on its own. Mirrors
    push()'s first-window ramp, the full-window loop, and the tail
    ramp-down exactly (tested against the analyzer — a missed shape here
    means a dispatch blocks on a fresh executable load the prewarm exists
    to hide)."""
    def tail_bucket(n: int) -> int:
        b = pair_batch
        while b // 2 >= max(n, 16):
            b //= 2
        return b

    chain = []  # == StreamingFlowAnalyzer._tail_chain
    c = pair_batch
    while c // 2 >= 16:
        c //= 2
        chain.append(c)

    buckets = []

    def add(b):
        if b != pair_batch and b not in buckets:
            buckets.append(b)

    s = 0
    ramp = tail_bucket(1)  # == StreamingFlowAnalyzer.ramp_pairs
    if ramp < pair_batch and n_pairs >= ramp + radius:
        # the runner's priming pull makes the ramp window fire first
        add(ramp)
        s = ramp
    while n_pairs >= s + pair_batch + radius:
        s += pair_batch
    while s < n_pairs:  # tail ramp-down partition
        b = next((c for c in chain if c < (n_pairs - s) - radius), 0)
        if b:
            add(b)
            s += b
        else:
            add(tail_bucket(n_pairs - s))
            s = n_pairs
    return buckets


# executable shapes already warmed in THIS process: (cfg, bucket, device).
# A fresh process pays ~30 s per shape even on a persistent-cache hit (the
# device plugin reloads server-side), so the prewarm is load-bearing once —
# but re-executing an already-warm program costs a device round trip + host
# CPU in the middle of the run (measured ~0.2-0.5 s/clip on the 1-core
# bench box, and folder mode paid it once PER CLIP — NOTES_ROUND5).
_PREWARMED: set = set()


def prewarm_shapes(cfg: PipelineConfig, radius: int, buckets, device=None):
    """Compile/load the flow program for each tail bucket, once per process.

    Blocking; used by the async prewarm thread and by bench.py's explicit
    warmup (which registers the shapes so the timed runs' prewarm threads
    skip them).

    Each shape's check + execute + registry-add runs atomically under
    ``DEVICE_LOCK`` — two clips' prewarm threads previously raced the
    check-then-act and compiled the same shape twice, and their concurrent
    executes wedged the relay client outright alongside worker
    ``device_get``s (deadlock repro, NOTES_ROUND5). Per-bucket locking (not
    around the whole loop) lets worker dispatches interleave between shape
    loads."""
    import jax
    import jax.numpy as jnp

    from .utils.devsync import DEVICE_LOCK

    for b in buckets:
        key = (cfg, int(b), device)
        with DEVICE_LOCK:
            if key in _PREWARMED:
                continue
            frames = np.zeros((b + 2 * radius + 1, 256, 256), np.uint8)
            if device is not None:
                fr = jax.device_put(frames, device)
                nv = jax.device_put(np.int32(1), device)
            else:
                fr = jnp.asarray(frames)
                nv = jnp.int32(1)
            flow_chunk_program(fr, nv, cfg)["dots"].block_until_ready()
            _PREWARMED.add(key)


def _prewarm_tail_async(cfg: PipelineConfig, radius: int, n_pairs: int,
                        device=None):
    """Start loading/compiling the tail-window executables in the background.

    The tail windows are otherwise first touched near EOF — after most
    decode and compute — so warming them concurrently with the main loop
    hides the fresh-process load cost entirely. Shapes already warmed in
    this process are skipped (no thread at all when everything is warm:
    repeat runs and folder clips 2..N must not pay a mid-run device round
    trip per clip for nothing)."""
    buckets = [b for b in _planned_tail_buckets(cfg.pair_batch, radius,
                                                n_pairs)
               if (cfg, int(b), device) not in _PREWARMED]
    if not buckets:
        return None

    def work():
        try:
            prewarm_shapes(cfg, radius, buckets, device)
        except Exception:
            pass  # warmup is best-effort; the real dispatch will surface errors

    import threading

    t = threading.Thread(target=work, daemon=True)
    t.start()
    return t


def process_video(video_path: str, params: Params, log_func,
                  progress_callback=None, cancel_flag=None,
                  preopened=None, device=None) -> bool:
    """Process one video into a ``.funscript``. Returns error_occurred.

    ``preopened``: optional (meta, source) prepared ahead of time by
    run_headless so video k+1's decode overlaps video k's tail (the
    cross-video analog of the reference's chunk prefetch, :1139-1185).
    ``device``: pin all device work to one jax.Device — the unit of
    video-level DP in run_headless's parallel folder mode.
    """
    start_time = time.time()
    output_path = funscript_path(video_path)
    if os.path.exists(output_path) and not params.overwrite:
        if preopened is not None:
            preopened[1].close()
        log_func(STRINGS["skipping_file_exists"].format(
            video_path=video_path, output_path=output_path))
        return False

    try:
        log_func(f"Processing video: {video_path}")
        if preopened is not None:
            meta, source = preopened
        else:
            meta, source = _open_video(video_path, params, cancel_flag,
                                       log_func)
    except Exception as e:
        log_func(f"ERROR: Unable to open video at {video_path}: {e}")
        return True
    if source is None:
        return True

    n_samples = len(meta.sampled_indices)
    log_func(
        f"FPS: {meta.fps:.2f}; downsampled to ~{meta.effective_fps:.2f} fps; "
        f"{n_samples} frames selected."
    )
    log_func(f"Using backend: {params.backend}")
    if n_samples < 2:
        source.close()
        log_func(STRINGS["video_too_short"].format(n=n_samples))
        return True

    cfg = PipelineConfig(
        pov_mode=params.pov_mode,
        cut_threshold=params.cut_threshold,
        pair_batch=params.pair_batch,
        flow_algorithm="dis" if params.backend == "DIS" else "farneback",
        dis_preset=params.dis_preset,
        use_pallas=params.use_pallas,
        warp_backend=params.warp_backend,
    )
    mesh = None
    if device is None and params.mesh and params.mesh > 1:
        from .parallel.mesh import make_mesh

        mesh = make_mesh(params.mesh)
        log_func(STRINGS["mesh_devices"].format(
            n=params.mesh, platform=mesh.devices.flat[0].platform))

    # --- intra-video checkpoint / resume (io.checkpoint docstring) ---
    # (the analyzer is constructed AFTER resume so it knows its LOCAL pair
    # total — what the tail ramp-down schedules against)
    n_pairs_total = n_samples - 1
    ckpt_path = ckpt_fp = None
    prefix_dots = np.zeros(0, np.float32)
    prefix_cuts = np.zeros(0, bool)
    resume_base = 0     # absolute pair index of the analyzer's local pair 0
    discard = 0         # local pairs that duplicate the prefix (halo recompute)
    if params.checkpoint:
        ckpt_path = ckpt_mod.sidecar_path(output_path)
        try:
            # engine from the OPEN source, not from params: only the source
            # knows about per-codec fast fallback / a failed .so build, and
            # a fast-engine sidecar must not silently resume onto the exact
            # path (or vice versa) — the streams differ numerically
            engine = "fast" if getattr(source, "is_fast", False) else "exact"
            ckpt_fp = ckpt_mod.fingerprint(video_path, meta, params,
                                           engine=engine)
        except OSError:
            ckpt_path = None
        loaded = ckpt_mod.load(ckpt_path, ckpt_fp) if ckpt_path else None
        if loaded is not None:
            start_pair = min(len(loaded[0]), n_pairs_total)
            # restart r pairs early: pairs >= start_pair need the centers of
            # pairs down to start_pair - r for the ±r temporal smoothing;
            # everything before that is independent per pair
            resume_base = max(0, start_pair - CENTER_SMOOTH_RADIUS)
            discard = start_pair - resume_base
            prefix_dots = loaded[0][:start_pair]
            prefix_cuts = loaded[1][:start_pair]
            log_func(STRINGS["resuming_checkpoint"].format(
                done=start_pair, total=n_pairs_total, halo=discard))
            source.close()  # was opened at sample 0 (possibly preopened)
            source = _make_frame_source(video_path, meta, params, cancel_flag,
                                        log_func, start_sample=resume_base)
            if source is None:
                return True
    analyzer = StreamingFlowAnalyzer(cfg, mesh=mesh, device=device,
                                     n_pairs_total=n_pairs_total - resume_base)
    if mesh is None:
        _prewarm_tail_async(cfg, analyzer.radius,
                            n_pairs_total - resume_base, device)

    results = []
    last_ckpt_pairs = len(prefix_dots)

    def _ckpt_save():
        """Persist prefix + drained local pairs (minus the recomputed halo)."""
        nonlocal last_ckpt_pairs
        if results:
            ld = np.concatenate([r["dots"] for r in results])[discard:]
            lc = np.concatenate([r["cuts"] for r in results])[discard:]
        else:
            ld, lc = np.zeros(0, np.float32), np.zeros(0, bool)
        d = np.concatenate([prefix_dots, ld.astype(np.float32)])
        c = np.concatenate([prefix_cuts, lc.astype(bool)])
        ckpt_mod.save(ckpt_path, d, c, ckpt_fp)
        last_ckpt_pairs = len(d)

    timers = StageTimers()
    # Pipeline priming: a window of pairs [0, B) needs B + radius pairs
    # (B + radius + 1 frames) buffered before the analyzer can dispatch it.
    # Pulling exactly B frames per iteration would leave the device idle
    # until TWO windows of frames had decoded (239 pairs < 246 needed);
    # pulling the halo along with the first chunk lets window 0 dispatch as
    # soon as it exists, fully overlapping device compute with decode.
    # Scaled by the analyzer's ACTUAL device count, not params.mesh: in the
    # video-level-DP folder mode the analyzer is single-device (mesh=None,
    # device pinned) and a mesh-sized pull would block until mesh*pair_batch
    # frames decoded — serializing decode before the first dispatch.
    # Single-device: prime with the analyzer's RAMP window instead — the
    # device starts on a small first window ~4x sooner, and a clip shorter
    # than pair_batch pairs (the 4K VR case) overlaps compute with its tail
    # decode instead of serializing after it (bitwise-invariant to the
    # dispatch partition; see StreamingFlowAnalyzer.ramp_pairs).
    pull = cfg.pair_batch * analyzer.n_devices
    if analyzer.mesh is None:
        next_pull = analyzer.ramp_pairs + analyzer.radius + 1
    else:
        next_pull = pull + 2 * analyzer.radius + 1
    try:
        with profile_trace(params.profile_dir or None):
            while True:
                if cancel_flag is not None and cancel_flag():
                    log_func(STRINGS["cancelled_by_user"])
                    if ckpt_path is not None:
                        # keep the in-flight window too: it's already computed
                        results.extend(analyzer.drain_pending())
                        _ckpt_save()  # cancel -> resumable
                    return False
                with timers.stage("decode_wait"):
                    batch = source.get_batch(next_pull)
                    next_pull = pull
                with timers.stage("device_compute"):
                    if batch:
                        results.extend(analyzer.push(batch))
                    else:
                        if cancel_flag is not None and cancel_flag():
                            # The frame source polls the cancel flag too
                            # (NativeFrameSource.get_batch, the prefetch
                            # producer) and truncates its stream when it
                            # fires — an empty batch here may be a cancel,
                            # not EOF. Treating it as EOF would silently
                            # write a truncated funscript as if the video
                            # ended at the cancel point.
                            log_func(STRINGS["cancelled_by_user"])
                            if ckpt_path is not None:
                                results.extend(analyzer.drain_pending())
                                _ckpt_save()  # cancel -> resumable
                            return False
                        results.extend(analyzer.flush())
                        break
                if ckpt_path is not None:
                    # cadence keyed on DISPATCHED pairs (the analyzer defers
                    # materialization mid-run); a due checkpoint drains the
                    # in-flight windows so the sidecar actually carries them
                    done = len(prefix_dots) + max(
                        0, analyzer.pairs_emitted - discard)
                    if done - last_ckpt_pairs >= ckpt_mod.CHECKPOINT_EVERY_PAIRS:
                        results.extend(analyzer.drain_pending())
                        _ckpt_save()
                if progress_callback is not None:
                    progress_callback(min(100, int(
                        100 * (resume_base + analyzer.pairs_emitted)
                        / max(1, n_pairs_total))))
    except Exception as e:
        log_func(f"ERROR: analysis failed for {video_path}: {e}")
        return True
    finally:
        source.close()
        analyzer.close()

    n_local = analyzer.pairs_emitted
    n_pairs = len(prefix_dots) + max(0, n_local - discard)
    if n_pairs < 1:
        log_func(f"ERROR: no frame pairs decoded for {video_path}.")
        return True

    if results:
        local_dots = np.concatenate([r["dots"] for r in results])[:n_local]
        local_cuts = np.concatenate([r["cuts"] for r in results])[:n_local]
    else:
        local_dots = np.zeros(0, np.float32)
        local_cuts = np.zeros(0, bool)
    dots = np.concatenate([prefix_dots,
                           local_dots[discard:].astype(np.float32)])
    cuts = np.concatenate([prefix_cuts, local_cuts[discard:].astype(bool)])
    time_stamps = np.arange(n_pairs) * meta.step  # original frame indices (:1151)

    error_occurred = False
    actions, _norm = compute_actions(
        dots, cuts, time_stamps, meta.fps, meta.effective_fps, params,
        log_func, mesh=mesh,
    )
    log_func(f"Keyframe reduction: {len(actions)} actions computed.")
    try:
        write_funscript(output_path, actions)
        log_func(STRINGS["funscript_saved"].format(output_path=output_path))
        if ckpt_path is not None:
            ckpt_mod.clear(ckpt_path)  # done: the funscript IS the result
    except Exception as e:
        log_func(STRINGS["log_error"].format(error=str(e)))
        error_occurred = True

    if progress_callback is not None:
        progress_callback(100)
    t = timers.report()
    log_func(
        f"Stage timers: decode_wait={t.get('decode_wait', 0):.2f}s "
        f"device_compute={t.get('device_compute', 0):.2f}s"
    )
    log_func(f"Processing time: {time.time() - start_time:.2f} seconds")
    return error_occurred


def resolve_clip_workers(params: Params, n_files: int) -> tuple:
    """(n_workers, n_devices) for a folder run: how many clips are in
    flight at once, over how many chips. ``clip_workers=0`` (auto) keeps
    one clip per chip when a mesh is configured; on a single chip it runs
    ``min(host_cores + 1, 4)`` in-flight clips — the chip is >85% idle at
    the host decode ceiling, so an extra clip's GIL-free C++ decode fills
    another clip's host-side serial sections (open/probe, window assembly
    + dispatch, signal chain, emit). The +1 is that gap-filler; the cap
    bounds memory (each in-flight clip holds a decode ring + a pending
    device window) and reflects the measured flat spot: on the 1-core
    bench box, 2 workers took the 3-clip folder from 16.3 s to 9.9 s and
    3 workers were parity with 2 (decode is core-bound — extra workers
    beyond cores+1 add contention, not decode; NOTES_ROUND4). On a
    multi-core box bench.py's folder_seq leg produces the scaling
    datapoint (VERDICT r4 #3). ``clip_workers=1`` restores the strictly
    sequential path; auto stays sequential when the native pump is
    unavailable (the Python decode path has no idle gaps worth filling
    and the extra thread only adds GIL contention)."""
    n_devices = max(1, min(params.mesh or 1, n_files))
    if params.clip_workers > 0:
        return min(params.clip_workers, n_files), n_devices
    if n_devices > 1:
        return n_devices, n_devices
    native = _detect_native(params, lambda m: None) is not None
    auto = min((os.cpu_count() or 1) + 1, 4)
    return (min(auto, n_files) if native else 1), 1


def _run_videos_parallel(files, params: Params, log_func,
                         progress_callback, n_workers: int,
                         cancel_flag=None,
                         video_progress_callback=None,
                         n_devices: int | None = None,
                         video_done_callback=None) -> bool:
    """Video-level data parallelism: round-robin videos over ``n_workers``
    concurrent in-flight clips on ``n_devices`` chips (SURVEY.md §2.4:
    folder mode = many clips feeding one mesh; the reference's sequential
    per-file loop :1633 becomes one video per worker). Each worker pins all
    its device work to its chip via committed inputs.

    ``n_workers`` may exceed ``n_devices`` (default: equal): workers then
    share chips round-robin. That is the single-chip throughput shape —
    the chip is >85% idle at the host decode ceiling (NOTES_ROUND3), so
    N in-flight clips interleave their windows into one device queue and
    clip B's C++ decode (GIL-free) fills clip A's host-side serial
    sections (open/probe, window assembly + dispatch, signal chain, emit).
    Per-video outputs are bitwise independent of the worker count (each
    video's analysis is self-contained; tested).

    Run-control parity with the sequential path (reference
    :1146-1148,1217-1253):

    * log lines stream live under a lock, tagged ``[devK]`` so interleaved
      workers stay readable (run.log is no longer grouped per video — the
      tag carries the grouping);
    * ``cancel_flag`` is polled between device batches inside each worker's
      ``process_video`` AND before dequeuing the next video;
    * overall progress counts fractional per-video progress of every active
      worker, and ``video_progress_callback(video_path, pct)`` exposes the
      per-video level.

    Workers are exception-guarded: a crash in one video logs the traceback,
    marks the batch errored, and moves on to the next queued video (per-video
    isolation, same as the sequential path's semantics).

    Funscript outputs are identical to the sequential runner's (per-video
    processing is independent; tested on the virtual CPU mesh).
    """
    import queue
    import threading
    import traceback

    import jax

    devices = jax.devices()[:(n_devices or n_workers)]
    work: queue.Queue = queue.Queue()
    for item in enumerate(files):
        work.put(item)
    lock = threading.Lock()
    state = {"err": False, "done": 0}
    frac = [0.0] * n_workers  # active video's fraction, per worker

    def overall_pct_locked():
        return min(100, int(100 * (state["done"] + sum(frac)) / len(files)))

    def worker(wid, dev):
        if n_workers > len(devices):
            tag = f"[w{wid}] "       # workers share chips: tag by worker
        elif len(devices) > 1:
            tag = f"[dev{wid}] "
        else:
            tag = ""

        def wlog(msg):
            with lock:
                log_func(tag + msg)

        while True:
            if cancel_flag is not None and cancel_flag():
                return
            try:
                i, video = work.get_nowait()
            except queue.Empty:
                return

            def vprog(pct, _video=video):
                with lock:
                    frac[wid] = pct / 100.0
                    if video_progress_callback is not None:
                        video_progress_callback(_video, pct)
                    if progress_callback is not None:
                        progress_callback(overall_pct_locked())

            wlog(STRINGS["processing_file"].format(
                current=i + 1, total=len(files), video_path=video))
            try:
                err = process_video(video, params, wlog, device=dev,
                                    progress_callback=vprog,
                                    cancel_flag=cancel_flag)
            except Exception:
                wlog(STRINGS["log_error"].format(
                    error=traceback.format_exc()))
                err = True
            with lock:
                state["err"] |= err
                state["done"] += 1
                frac[wid] = 0.0
                if video_done_callback is not None:
                    video_done_callback(video, err)
                if progress_callback is not None:
                    progress_callback(overall_pct_locked())

    threads = [threading.Thread(target=worker, args=(i, devices[i % len(devices)]))
               for i in range(n_workers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return state["err"]


def run_headless(input_path: str, params: Params, log_path: str = "run.log",
                 progress_callback=None, cancel_flag=None,
                 video_progress_callback=None) -> bool:
    """Folder/file batch runner with run.log tee (reference :2606-2638).

    With ``--mesh N`` and more than one input file, videos round-robin over
    N devices (one per chip) instead of sharding each video's windows —
    whole-clip DP utilizes the mesh better than window DP when the folder
    is the workload (SURVEY.md §2.4).

    ``cancel_flag`` (nullary -> bool) is polled between device batches and
    between videos on both the sequential and the parallel path;
    ``video_progress_callback(video_path, pct)`` reports per-video progress
    (parallel path; the sequential path reports it through
    ``progress_callback`` as before).
    """
    logf = open(log_path, "w")

    def log_func(msg):
        logf.write(msg + "\n")
        logf.flush()
        print(msg)

    try:
        files = iodec.find_videos(input_path)
        if not files:
            log_func("No video files found.")
            return False
        log_func(STRINGS["found_files"].format(n=len(files)))

        n_workers, n_devices = resolve_clip_workers(params, len(files))
        if n_workers > 1:
            any_error = _run_videos_parallel(
                files, params, log_func, progress_callback, n_workers,
                cancel_flag=cancel_flag,
                video_progress_callback=video_progress_callback,
                n_devices=n_devices)
            log_func(STRINGS["batch_processing_complete"])
            return any_error

        def prepare(path):
            """Open video k+1's decode source while video k computes (the
            cross-video analog of the reference's chunk prefetch)."""
            if os.path.exists(funscript_path(path)) and not params.overwrite:
                return None  # will be skipped; don't waste decode on it
            try:
                meta, src = _open_video(path, params, None, log_func)
                return None if src is None else (meta, src)
            except Exception:
                return None  # process_video will re-probe and log the error

        any_error = False
        pre = None
        try:
            for idx, video in enumerate(files):
                this_pre, pre = pre, None
                if cancel_flag is not None and cancel_flag():
                    if this_pre is not None:
                        this_pre[1].close()
                    log_func(STRINGS["cancelled_by_user"])
                    break
                if idx + 1 < len(files):
                    pre = prepare(files[idx + 1])
                log_func(STRINGS["processing_file"].format(
                    current=idx + 1, total=len(files), video_path=video))
                any_error |= process_video(
                    video, params, log_func,
                    progress_callback=progress_callback, preopened=this_pre,
                    cancel_flag=cancel_flag,
                )
        finally:
            if pre is not None:
                pre[1].close()
        log_func(STRINGS["batch_processing_complete"])
        return any_error
    finally:
        logf.close()
        print(f"Done. See {log_path} for details.")
