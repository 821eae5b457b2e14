"""The flagship device program: RGB frame batch -> per-pair motion scalars.

This is the TPU inversion of the reference's per-pair host pipeline
(FunscriptFlow.pyw:843-907, 1188-1242): instead of multiprocess pools
pickling frames and full flow fields between host processes, one compiled
XLA program takes a ``[N, H, W, 3] uint8`` RGB frame window in HBM and
returns only ``[B]`` scalars + ``[B, 2]`` centers — the flow fields never
leave the device.

Chunking contract (fixes the reference's chunk-boundary defects, documented
in SURVEY.md §5): callers process pair micro-batches with a
``CENTER_SMOOTH_RADIUS``-pair halo on each side, so

* the flow pair spanning two chunks is computed (the reference drops it,
  :1150, :1188), and
* the +/-6-pair center smoothing window only truncates at true video edges,
  not at chunk edges.

``FlowAnalyzer.analyze_video_pairs`` implements that stitching on host.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.farneback import FarnebackConfig, farneback_flow_planes
from ..utils.devsync import DEVICE_LOCK
from ..ops.reductions import (
    CENTER_SMOOTH_RADIUS,
    max_divergence_center,
    mean_flow_magnitude,
    radial_motion_weighted,
    smooth_centers,
)

__all__ = ["PipelineConfig", "rgb_to_gray_cv", "flow_chunk_program", "FlowAnalyzer"]

ANALYSIS_SIZE = 256  # reference analyses at 256x256 gray (FunscriptFlow.pyw:1057)


@dataclass(frozen=True)
class PipelineConfig:
    """Static (compile-time) pipeline parameters."""

    pov_mode: bool = False
    cut_threshold: float = 7.0  # reference :876 (config-only key, default 7)
    pair_batch: int = 240      # device micro-batch of pairs (tunable)
    flow_algorithm: str = "farneback"  # farneback | dis (reference "DNN" backend)
    dis_preset: str = "fast"           # ultrafast | fast | medium (cv2 presets)
    use_pallas: str = "auto"           # fused Mosaic polyexp + blur/solve
                                       # kernels: auto (on for TPU) | on | off
    warp_backend: str = "auto"         # auto | pallas | xla (ops.farneback)
    warp_dtype: str = "bfloat16"       # XLA warp-path operand dtype
    pyr_scale: float = 0.5
    levels: int = 3
    winsize: int = 15
    iterations: int = 3
    poly_n: int = 5
    poly_sigma: float = 1.2

    def farneback(self) -> FarnebackConfig:
        return FarnebackConfig(self.pyr_scale, self.levels, self.winsize,
                               self.iterations, self.poly_n, self.poly_sigma,
                               use_pallas=self.use_pallas,
                               warp_dtype=self.warp_dtype,
                               warp_backend=self.warp_backend)


def rgb_to_gray_cv(rgb: jax.Array) -> jax.Array:
    """Exact cv2.cvtColor(RGB2GRAY) on uint8: fixed-point BT.601.

    Y = (R*9798 + G*19235 + B*3735 + 2^14) >> 15, matching OpenCV's integer
    path bit-for-bit (verified exhaustively in tests) so the device pipeline
    sees the same grayscale input the reference's host pipeline does
    (FunscriptFlow.pyw:1079-1082).
    """
    r = rgb[..., 0].astype(jnp.int32)
    g = rgb[..., 1].astype(jnp.int32)
    b = rgb[..., 2].astype(jnp.int32)
    y = (r * 9798 + g * 19235 + b * 3735 + (1 << 14)) >> 15
    return y.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("cfg",))
def flow_chunk_program(frames: jax.Array, n_pairs: jax.Array, cfg: PipelineConfig):
    """frames [B+1, H, W, 3] uint8 RGB or [B+1, H, W] uint8 gray, n_pairs
    traced valid-pair count -> dict(dots [B], cuts [B], centers [B,2],
    mean_mag [B], val_pos [B]).

    One fused program: gray -> batched Farnebäck flow -> divergence-argmax
    centers (or fixed bottom-center in POV mode, reference :880-882) -> cut
    flags -> +/-6 temporal center smoothing -> weighted radial projection.

    Gray input is the production path (3x less H2D; the host's cv2
    BGR2GRAY is bit-identical to rgb_to_gray_cv — tested); RGB is kept for
    parity tests and ad-hoc use.
    """
    gray = frames.astype(jnp.float32) if frames.ndim == 3 else rgb_to_gray_cv(frames)
    f0, f1 = gray[:-1], gray[1:]
    if cfg.flow_algorithm == "dis":
        from .dis import DISConfig, dis_flow_planes

        u, v = dis_flow_planes(f0, f1, DISConfig.preset(cfg.dis_preset))
    else:
        u, v = farneback_flow_planes(f0, f1, cfg.farneback())

    B, H, W = f0.shape
    if cfg.pov_mode:
        centers = jnp.broadcast_to(
            jnp.array([[W // 2, H - 1]], jnp.float32), (B, 2)
        )
        val_pos = jnp.zeros((B,), jnp.float32)
    else:
        centers, val_pos = max_divergence_center(u, v)

    mean_mag = mean_flow_magnitude(u, v)
    cuts = mean_mag > cfg.cut_threshold

    sm_centers = smooth_centers(centers, n_pairs)
    dots = radial_motion_weighted(u, v, sm_centers, cuts, cfg.pov_mode)

    valid = jnp.arange(B) < n_pairs
    return {
        "dots": jnp.where(valid, dots, 0.0),
        "cuts": cuts & valid,
        "centers": sm_centers,
        "raw_centers": centers,
        "mean_mag": jnp.where(valid, mean_mag, 0.0),
        "val_pos": jnp.where(valid, val_pos, 0.0),
    }


class FlowAnalyzer:
    """Host-side driver for the device program: halo stitching + micro-batching.

    Feed it the full downsampled-frame stream (or chunk windows) as uint8 RGB
    [N, 256, 256, 3]; it returns per-pair scalars for all N-1 pairs, bitwise
    independent of the micro-batch size (tested), with center smoothing
    windows truncated only at true video edges.
    """

    def __init__(self, cfg: PipelineConfig | None = None, device=None):
        self.cfg = cfg or PipelineConfig()
        self.device = device
        self.radius = CENTER_SMOOTH_RADIUS

    def analyze_video_pairs(self, frames: np.ndarray) -> dict:
        """frames [N, H, W, 3] uint8 -> dict of np arrays of length N-1."""
        n_total = frames.shape[0] - 1
        if n_total <= 0:
            return {
                "dots": np.zeros(0, np.float32),
                "cuts": np.zeros(0, bool),
                "centers": np.zeros((0, 2), np.float32),
                "mean_mag": np.zeros(0, np.float32),
                "val_pos": np.zeros(0, np.float32),
            }
        B = self.cfg.pair_batch
        out = {"dots": [], "cuts": [], "centers": [], "mean_mag": [], "val_pos": []}
        for s in range(0, n_total, B):
            e = min(s + B, n_total)
            a = max(0, s - self.radius)
            b = min(n_total, e + self.radius)
            window = frames[a : b + 1]  # pairs [a, b) need frames [a, b]
            n_valid = b - a
            pad = B + 2 * self.radius - n_valid
            if pad > 0:
                window = np.concatenate(
                    [window, np.repeat(window[-1:], pad, axis=0)], axis=0
                )
            with DEVICE_LOCK:
                res = flow_chunk_program(
                    jnp.asarray(window), jnp.int32(n_valid), self.cfg)
                res = jax.device_get({k: res[k] for k in out})
            lo, hi = s - a, e - a
            for k in out:
                out[k].append(res[k][lo:hi])
        return {k: np.concatenate(v, axis=0) for k, v in out.items()}


class StreamingFlowAnalyzer:
    """Streaming variant: push decoded frames, collect per-pair results.

    Holds only a rolling window of ``pair_batch + 2*radius + 1`` frames —
    constant memory regardless of video length (the reference instead holds a
    whole 3000-frame bracket of flow fields, ~1.5 GB, readme.txt:11). Results
    are bitwise identical to ``FlowAnalyzer.analyze_video_pairs`` (tested).
    """

    KEYS = ("dots", "cuts", "centers", "mean_mag", "val_pos")

    def __init__(self, cfg: PipelineConfig | None = None, mesh=None,
                 device=None, n_pairs_total: int | None = None):
        """``mesh``: optional jax.sharding.Mesh — each dispatch then covers
        ``n_devices * pair_batch`` pairs, one halo'd window per device under
        shard_map (parallel.dp). Per-pair results are bitwise identical to
        the single-device path because every emitted pair sees the same
        halo'd frame window either way (batch-size invariance, tested).

        ``device``: optional single jax.Device to pin dispatches to (jit
        follows committed inputs) — the unit of video-level data parallelism
        in run_headless's folder mode (one analyzer per device, one video
        each). Mutually exclusive with ``mesh``.

        ``n_pairs_total``: the video's known pair count (upper bound — a
        truncated container may deliver fewer, which flush() handles with
        real counts). Knowing the total enables the tail ramp-DOWN
        (``_ramp_down``): without it the last sub-batch of pairs can only
        dispatch at flush(), serializing a whole window's decode + H2D +
        compute + D2H past the final decoded frame."""
        self.cfg = cfg or PipelineConfig()
        self.mesh = mesh
        self.device = device
        self._n_total = n_pairs_total
        assert mesh is None or device is None
        self._D = 1 if mesh is None else int(mesh.devices.size)
        self.radius = CENTER_SMOOTH_RADIUS
        self._buf: list = []   # pending frames
        self._base = 0         # absolute frame index of _buf[0]
        self._s = 0            # next pair index to emit
        self._n_frames = 0
        self._pending: list = []  # dispatched-but-unmaterialized device results
        # Upload policy. Multi-core hosts: a single-worker uploader thread
        # runs window assembly (np.stack, ~16 MB) + H2D device_put + program
        # dispatch off the caller's thread on a spare core, so the caller
        # returns to decode immediately (one worker => dispatches stay
        # ordered). Single-core hosts: that thread is pure overhead — the
        # work it "offloads" is ~25 ms/window, but the GIL ping-pong between
        # it, the drain path, and the C++ decode threads measured ~+2 s of
        # CPU per 20 s clip (round-4 profiling, NOTES_ROUND4) — so dispatch
        # runs inline; JAX's async dispatch still overlaps device compute
        # with decode. ``FF_TPU_ASYNC_UPLOAD=0/1`` overrides the policy.
        import os

        env = os.environ.get("FF_TPU_ASYNC_UPLOAD")
        async_upload = ((os.cpu_count() or 1) > 1) if env is None \
            else env not in ("0", "off", "false")
        if async_upload:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=1)
        else:
            self._pool = None

    def _frames_window(self, a: int, b: int, batch: int | None = None) -> np.ndarray:
        """Frames [a, b] (absolute), padded to the static program shape."""
        i0, i1 = a - self._base, b - self._base + 1
        window = np.stack(self._buf[i0:i1])
        need = (batch or self.cfg.pair_batch) + 2 * self.radius + 1
        if window.shape[0] < need:
            pad = np.repeat(window[-1:], need - window.shape[0], axis=0)
            window = np.concatenate([window, pad], axis=0)
        return window

    def _tail_bucket(self, n_pairs: int) -> int:
        """Smallest power-of-two fraction of pair_batch (>= 16) covering the
        tail — a short last window then doesn't pay a full batch of padded
        compute, and the final round trip serialized past EOF shrinks with
        it (floor lowered 32 -> 16 in round 5: the tail is latency-bound
        over the relay, and the extra shape's compile hides behind the
        prewarm). Results are bucket-size invariant (the windows carry the
        same frames and valid count; tested batch-size invariance)."""
        b = self.cfg.pair_batch
        while b // 2 >= max(n_pairs, 16):
            b //= 2
        return b

    def _dispatch(self, e: int, n_total: int | None) -> None:
        """Enqueue one device program call; results stay on device.

        JAX dispatch is asynchronous, so keeping a one-deep pending queue
        lets the host assemble + upload the next window while the device
        chews on the current one (the host/device pipeline the reference
        built with a prefetch thread + Queue(1), :1139-1185).
        """
        s, r = self._s, self.radius
        if self.mesh is None:
            a = max(0, s - r)
            b = e + r if n_total is None else min(n_total, e + r)
            bucket = self._tail_bucket(e - s)
            # snapshot the frame views now (cheap); stack + upload + dispatch
            # happen on the uploader thread
            i0, i1 = a - self._base, b - self._base + 1
            views = self._buf[i0:i1]
            if self._pool is not None:
                res = self._pool.submit(self._upload_and_run, views, bucket,
                                        b - a)
            else:
                res = self._upload_and_run(views, bucket, b - a)
            self._pending.append((res, [(None, s - a, e - a)]))
        else:
            from ..parallel.dp import analyze_windows_sharded

            B = self.cfg.pair_batch
            windows, n_valid, segs = [], [], []
            for d in range(self._D):
                sd = min(s + d * B, e)
                ed = min(sd + B, e)
                ad = max(0, sd - r)
                bd = ed + r if n_total is None else min(n_total, ed + r)
                windows.append(self._frames_window(ad, bd))
                n_valid.append(bd - ad)
                segs.append((d, sd - ad, ed - ad))
            stacked = np.stack(windows)
            with DEVICE_LOCK:
                res = self._start_fetch(analyze_windows_sharded(
                    stacked, np.asarray(n_valid, np.int32),
                    self.cfg, self.mesh,
                ))
            self._pending.append((res, segs))
        self._s = e
        drop = max(0, (self._s - r) - self._base)
        if drop:
            del self._buf[:drop]
            self._base += drop

    def _upload_and_run(self, views: list, bucket: int, n_valid: int):
        """Uploader-thread body: assemble the padded window, ship it to the
        device, and enqueue the program. Returns the device result dict.
        Runs strictly in dispatch order (single worker)."""
        window = np.stack(views)
        need = bucket + 2 * self.radius + 1
        if window.shape[0] < need:
            pad = np.repeat(window[-1:], need - window.shape[0], axis=0)
            window = np.concatenate([window, pad], axis=0)
        # host assembly above stays lock-free; only the relay interactions
        # (upload, enqueue, D2H start) serialize — see utils.devsync
        with DEVICE_LOCK:
            if self.device is not None:
                win_dev = jax.device_put(window, self.device)
                nv = jax.device_put(np.int32(n_valid), self.device)
            else:
                win_dev = jnp.asarray(window)
                nv = jnp.int32(n_valid)
            return self._start_fetch(flow_chunk_program(win_dev, nv, self.cfg))

    def _start_fetch(self, res):
        """Start the D2H copies for one window's results at DISPATCH time.

        JAX pipelines the async copy behind the (also async) compute, so by
        the time _drain materializes a window — one window later mid-run,
        or at flush — the value is already host-side and device_get returns
        immediately. Materializing eagerly in _drain instead blocked
        ~0.2-0.3 s per window on the relay's D2H round trip (~1.1 s per
        20 s clip); starting copies only at drain time still left flush
        serializing the last two windows' round trips (~0.45 s, profiled
        in NOTES_ROUND4)."""
        for k in self.KEYS:
            arr = res[k]
            if hasattr(arr, "copy_to_host_async"):
                arr.copy_to_host_async()
        return res

    # mid-run drains materialize only once this many windows are in
    # flight — a bound on result-buffer lifetime (each window's results
    # are a few KB on device; 64 windows ≈ 8.5 min of 30 fps video), not
    # a throughput knob
    MAX_PENDING = 64

    def _drain(self, keep: int) -> list:
        """Materialize pending windows down to ``keep`` (0 = everything:
        flush/cancel). Mid-run calls (keep > 0) DEFER instead: device_get
        on a mid-run window blocks the 1-core host ~0.1-0.4 s per clip on
        relay round trips even though the D2H copy was started at dispatch
        (paired A/B, NOTES_ROUND5), so results stay on device until
        flush — by which time everything has landed and the per-window
        get costs ~20 ms total — except on very long videos where the
        backlog cap kicks in. Polling readiness is not an option: on the
        proxy backend jax.Array.is_ready() returns True for still-in-
        flight results (measured), so there is nothing truthful to gate
        on."""
        limit = keep if keep == 0 else max(keep, self.MAX_PENDING)
        batch = []
        while len(self._pending) > limit:
            res, segs = self._pending.pop(0)
            if hasattr(res, "result"):
                # future-wait OUTSIDE the device lock: the uploader thread
                # completing this future needs DEVICE_LOCK itself
                res = res.result()  # uploader future; re-raises its errors
            batch.append(({k: res[k] for k in self.KEYS}, segs))
        if not batch:
            return []
        # ONE device_get for every window being materialized: each call
        # costs a relay round trip regardless of size (per-key np.asarray
        # measured ~140 ms/window vs ~40 ms for a batched dict; batching
        # the flush's 3-4 windows into a single call removes the remaining
        # per-window trips from the serialized tail), and the copies have
        # been in flight since dispatch (_start_fetch)
        with DEVICE_LOCK:
            np_batch = jax.device_get([r for r, _ in batch])
        out = []
        for np_res, segs in zip(np_batch, (s for _, s in batch)):
            for d, lo, hi in segs:
                if hi <= lo:
                    continue
                if d is None:
                    out.append({k: np_res[k][lo:hi] for k in self.KEYS})
                else:
                    out.append({k: np_res[k][d, lo:hi] for k in self.KEYS})
        return out

    def _tail_chain(self):
        """Sub-batch window bucket sizes, descending — exactly the shapes
        ``_tail_bucket`` can return below ``pair_batch``, so the tail
        ramp-down never introduces a compile shape the prewarm
        (runner._planned_tail_buckets) doesn't already cover."""
        b = self.cfg.pair_batch
        while b // 2 >= 16:
            b //= 2
            yield b

    def _ramp_down(self) -> None:
        """Tail ramp-DOWN (single-device, total known): once no full window
        fits before EOF, dispatch the remaining pairs as DESCENDING buckets
        as soon as each window's frames (+halo) have decoded, so the only
        round trip serialized after the final decoded frame is the smallest
        final window's — not a whole window's worth of decode followed by a
        full H2D + compute + D2H (round 4's fixed ~0.7 s/clip flush tail).
        Mirrors the first-window ramp-UP at the other end of the clip.

        A sub-window of size ``b`` is only split off when its halo still
        ends strictly before the final frame (``b < remaining - radius``):
        a window that needs the last frame anyway cannot overlap any decode,
        and splitting it would only add relay round trips. Bitwise-invariant
        to the partition (every pair sees the same halo'd frames; tested
        partition invariance)."""
        n_total, r, B = self._n_total, self.radius, self.cfg.pair_batch
        avail = self._n_frames - 1  # pairs decodable so far
        while self._s < n_total and n_total < self._s + B + r:
            remaining = n_total - self._s
            b = next((c for c in self._tail_chain() if c < remaining - r), 0)
            if b:
                if avail < self._s + b + r:
                    return  # halo frames not decoded yet; retry next push
                self._dispatch(self._s + b, n_total)
            else:
                if avail < n_total:
                    return  # the final window needs the last frame
                self._dispatch(n_total, n_total)

    @property
    def ramp_pairs(self) -> int:
        """First-window ramp size in pairs (single-device): the SMALLEST
        tail bucket, so the ramp window reuses a program shape short-clip
        tails compile anyway. Without the ramp, a clip shorter than
        ~pair_batch pairs (VR bench: 6 s = 179 pairs) decodes COMPLETELY
        before the device sees frame one — decode and device compute
        serialize instead of overlapping (measured +0.4-0.7 s on the 4K VR
        scenario, NOTES_ROUND4). Results are bitwise invariant to the
        dispatch partition (bucket/batch-size invariance, tested), so this
        is schedule-only."""
        return self._tail_bucket(1)

    def push(self, frames) -> list:
        """Add decoded frames; returns a list of result dicts (maybe empty)."""
        self._buf.extend(frames)
        self._n_frames += len(frames)
        B, r = self.cfg.pair_batch * self._D, self.radius
        # first-window ramp: nothing dispatched yet and a full window isn't
        # available — start the device on a small prefix now (mesh mode
        # keeps whole-window dispatches: one window per device)
        if (self.mesh is None and self._s == 0 and not self._pending
                and self._n_frames - 1 < B + r
                and self._n_frames - 1 >= self.ramp_pairs + r):
            self._dispatch(self.ramp_pairs, None)
        # pairs available so far: one per frame except the last
        while self._n_frames - 1 >= self._s + B + r:
            self._dispatch(self._s + B, None)
        # tail ramp-down: the total is known and no further full window fits
        # before EOF — dispatch descending tail buckets while decode runs
        if self.mesh is None and self._n_total is not None:
            self._ramp_down()
        return self._drain(keep=1)

    def drain_pending(self) -> list:
        """Materialize every dispatched-but-undrained window WITHOUT
        dispatching new work. Checkpoint/cancel path: the device has
        already paid for these pairs, so the sidecar should keep them
        (runner._ckpt_save); ``push`` alone defers materialization (see
        ``_drain``), so most results surface here or at flush."""
        return self._drain(keep=0)

    def flush(self) -> list:
        """Video ended: emit remaining pairs with end-truncated smoothing.

        With ``n_pairs_total`` provided and the container delivering every
        promised frame, the tail ramp-down already dispatched everything and
        this just drains. The dispatch loop below is the fallback for an
        unknown total or a truncated container (fewer real frames than the
        metadata promised) — it uses ACTUAL counts, so truncation keeps the
        reference's failure semantics (process what arrived)."""
        n_total = max(self._n_frames - 1, 0)
        while self._s < n_total:
            e = min(self._s + self.cfg.pair_batch * self._D, n_total)
            self._dispatch(e, n_total)
        out = self._drain(keep=0)
        self.close()
        return out

    def close(self) -> None:
        """Release the uploader thread (no-op in inline-dispatch mode).
        Idempotent; called by flush() on the normal path — cancel paths that
        stop before flush must call it too, or every cancelled video leaks
        one pool worker until exit."""
        if self._pool is not None:
            self._pool.shutdown(wait=False)

    @property
    def pairs_emitted(self) -> int:
        return self._s

    @property
    def n_devices(self) -> int:
        """Devices each dispatch spans (1 unless a mesh shards windows)."""
        return self._D
