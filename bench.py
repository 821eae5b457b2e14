"""End-to-end benchmark: video -> funscript, x-realtime per chip.

Prints ONE JSON line. Headline metric (stable across rounds): a 20 s
synthetic 1080p30 clip processed end-to-end (decode + flow + signal + emit),
best of 3. Extra fields in the same line:

* ``folder_x_realtime`` — the reference's actual workload shape ("a hundred
  gigs per day", README.md:1): a folder of three mixed-length clips through
  ``run_headless`` (exercises cross-video decode prefetch), one pass.
* ``decode_wait_s`` / ``device_compute_s`` — stage split of the best
  single-clip run (from the runner's StageTimers).
* ``pairs_per_s`` — device-side flow throughput implied by that run.
* ``codec`` — h264 when an encoder is available (long-GOP, like real
  content), else mp4v.

Baseline: the reference is "usually faster than watching it" on a desktop
CPU, i.e. ~1x realtime (README.md:52-53, BASELINE.md) — ``vs_baseline`` is
the same multiple.
"""

import json
import os
import re
import sys
import time

import numpy as np

BENCH_DIR = "/tmp/ff_bench"
DURATION_S = 20.0
FPS = 30


def _writer(path, fps, size):
    """Prefer an h264 encoder (long-GOP, like real content); mp4v fallback."""
    import cv2

    for fourcc in ("avc1", "H264", "mp4v"):
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*fourcc), fps, size)
        if vw.isOpened():
            return vw, ("h264" if fourcc != "mp4v" else "mp4v")
    raise RuntimeError("no usable encoder")


def make_bench_video(path: str, seconds: float, h: int = 1080, w: int = 1920,
                     seed: int = 0) -> str:
    import cv2

    n = int(seconds * FPS)
    rng = np.random.default_rng(seed)
    tex = cv2.GaussianBlur((rng.random((h * 2, w * 2)) * 255).astype(np.float32), (0, 0), 5)
    vw, codec = _writer(path, FPS, (w, h))
    for i in range(n):
        if i == n // 2:
            tex = cv2.GaussianBlur(
                (rng.random((h * 2, w * 2)) * 255).astype(np.float32), (0, 0), 5
            )
        s = float(np.exp(0.05 * np.sin(2 * np.pi * i / 45.0)))
        M = cv2.getRotationMatrix2D((w, h), 0, s)
        M[0, 2] += 3.0 * np.sin(2 * np.pi * i / 200.0)
        img = cv2.warpAffine(tex, M, (w * 2, h * 2))[h // 2 : h // 2 + h, w // 2 : w // 2 + w]
        vw.write(cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8), cv2.COLOR_GRAY2BGR))
    vw.release()
    return codec


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from funscript_flow_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    from funscript_flow_tpu.models.pipeline import PipelineConfig, flow_chunk_program
    from funscript_flow_tpu.runner import process_video, run_headless
    from funscript_flow_tpu.utils.params import Params

    os.makedirs(BENCH_DIR, exist_ok=True)
    main_clip = os.path.join(BENCH_DIR, "clip_main.mp4")
    folder = os.path.join(BENCH_DIR, "folder")
    os.makedirs(folder, exist_ok=True)
    codec = None
    if not os.path.exists(main_clip):
        codec = make_bench_video(main_clip, DURATION_S)
    folder_specs = [("a_20s_1080p.mp4", 20.0, 1080, 1920, 1),
                    ("b_12s_1080p.mp4", 12.0, 1080, 1920, 2),
                    ("c_8s_720p.mp4", 8.0, 720, 1280, 3)]
    for name, secs, h, w, seed in folder_specs:
        p = os.path.join(folder, name)
        if not os.path.exists(p):
            codec = make_bench_video(p, secs, h, w, seed) or codec
    if codec is None:  # clips were cached; probe the encoder choice cheaply
        import cv2

        vw = cv2.VideoWriter(os.path.join(BENCH_DIR, "probe.mp4"),
                             cv2.VideoWriter_fourcc(*"avc1"), 30, (64, 64))
        codec = "h264" if vw.isOpened() else "mp4v"
        vw.release()

    params = Params(overwrite=True)

    # Warm up compilation for the production shapes: the gray full window
    # and the 128-pair tail bucket the 20 s clip ends with (the production
    # path ships grayscale; warming RGB would compile a program the run
    # never uses).
    import jax.numpy as jnp

    cfg = PipelineConfig(pair_batch=params.pair_batch)
    for bucket in (params.pair_batch, 128):
        warm_frames = np.zeros((bucket + 13, 256, 256), np.uint8)
        flow_chunk_program(
            jnp.asarray(warm_frames), jnp.int32(4), cfg
        )["dots"].block_until_ready()

    # --- scenario 1: single 20 s 1080p30 clip, best of 5 (shared-pool noise:
    # back-to-back identical runs measure 10.6-12.9x; min-of-N converges) ---
    walls, splits = [], []
    timer_re = re.compile(r"decode_wait=([0-9.]+)s device_compute=([0-9.]+)s")
    for _ in range(5):
        lines = []
        t0 = time.time()
        err = process_video(main_clip, params, log_func=lines.append)
        wall = time.time() - t0
        if err:
            print(json.dumps({"metric": "bench_error", "value": 0, "unit": "", "vs_baseline": 0}))
            return
        m = next((timer_re.search(ln) for ln in lines if timer_re.search(ln)), None)
        walls.append(wall)
        splits.append((float(m.group(1)), float(m.group(2))) if m else (0.0, 0.0))

    best = int(np.argmin(walls))
    x_rt = DURATION_S / walls[best]
    decode_wait, device_compute = splits[best]
    n_pairs = int(DURATION_S * FPS) - 1
    pairs_per_s = n_pairs / max(device_compute, 1e-9)

    # --- scenario 2: folder batch (3 clips, 40 s of video), best of 3 ---
    # (the shared TPU pool shows transient multi-x contention; a single pass
    # can land entirely inside a contended window and under-report by 3-4x)
    total_secs = sum(s for _, s, _, _, _ in folder_specs)
    folder_x_rt = 0.0
    for _ in range(3):
        t0 = time.time()
        err = run_headless(folder, params,
                           log_path=os.path.join(BENCH_DIR, "run.log"))
        if not err:
            folder_x_rt = max(folder_x_rt, total_secs / (time.time() - t0))

    print(json.dumps({
        "metric": "1080p30 end-to-end (decode+flow+signal+emit) per chip",
        "value": round(x_rt, 2),
        "unit": "x_realtime",
        "vs_baseline": round(x_rt / 1.0, 2),
        "folder_x_realtime": round(folder_x_rt, 2),
        "decode_wait_s": round(decode_wait, 2),
        "device_compute_s": round(device_compute, 2),
        "pairs_per_s": round(pairs_per_s, 1),
        "codec": codec,
    }))


if __name__ == "__main__":
    main()
