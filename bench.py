"""End-to-end benchmark: video -> funscript, x-realtime per chip.

Prints ONE JSON line. Headline metric (round 3+): a 20 s synthetic
**1080p30 long-GOP h264** clip (the dominant real-library codec and the
reference's decode hot spot, FunscriptFlow.pyw:177-189) processed
end-to-end (decode + flow + signal + emit), best of 6. Clips are written
through the native encoder (runtime/encoder.cpp: libx264, GOP 250,
3 B-frames); when that encoder is unavailable the whole bench falls back
to mp4v and says so in ``codec``.

Extra fields in the same line:

* ``folder_x_realtime`` — the reference's actual workload shape ("a hundred
  gigs per day", README.md:1): a folder of three mixed-length h264 clips
  through ``run_headless`` with N clips in flight on the one chip
  (clip_workers auto), best of 6; each rep paired with a folder decode
  calibration (``folder_decode_only_s`` /
  ``folder_overlap_efficiency[_med]``). Folder reps are INTERLEAVED with
  the headline's single-clip reps (round 5) so the folder-vs-single
  comparison samples the same pool-weather windows instead of being
  decided by drift between two separate measurement blocks.
  ``folder_seq_x_realtime`` — the same folder with clip_workers=1,
  >1-core boxes only (the clip-worker scaling leg).
* ``mp4v_x_realtime`` — the same 20 s clip re-encoded as mp4v, best of 4:
  comparable to the round-1/2 headline numbers (mpegvideo codecs keep the
  libav lowres fast-decode path that h264 doesn't have).
* ``vr_x_realtime`` — a 6 s 4K (3840x1920) side-by-side VR clip with
  ``vr_mode=True`` (512-quadrant crop from >=4K decode — the expensive
  real-world case, FunscriptFlow.pyw:1076-1079), best of 5. The fixture
  carries a LOCALIZED radial-pulse signal centered in the analyzed
  region (see make_bench_video), so VR decode speed and VR funscript
  fast-vs-exact parity are measured on the same content (round 5;
  measured parity on this fixture: pos |delta| p95 1, max 2 — the old
  cheap-pan fixture's signal was below the fast engine's luma dither and
  a uniform zoom left the divergence-argmax center degenerate).
* ``vr60_x_realtime`` — the same scenario at **60 fps** (the dominant
  real-world VR frame rate): sampling steps to every 2nd frame, so the
  fast engine's grid-aware per-packet ``AVDISCARD_NONREF`` skips off-grid
  non-reference frames outright — the representative premium workload,
  best of 5 (paired: ``vr60_overlap_efficiency``).
* ``decode_wait_s`` / ``device_compute_s`` — stage split of the best
  single-clip h264 run (from the runner's StageTimers).
* ``pairs_per_s`` — device-side flow throughput implied by that run.
* ``decode_only_s`` — raw pump decode of the same clip, nothing else
  running (best over the paired calibration reps): the host-side floor
  the e2e wall is bound by on a 1-core box.
* ``overlap_efficiency`` — contention-robust pipeline-quality measure
  (VERDICT r3 #2): every e2e rep is IMMEDIATELY followed by a raw-decode
  calibration rep of the same clip in the same pool window, and the
  efficiency of rep i is ``cal_i / e2e_wall_i`` (1.0 = the pipeline adds
  nothing over raw decode). The reported value is the best per-rep pair,
  so shared-pool weather cancels out of the ratio even when it moves the
  absolute numbers 2-3x (NOTES_ROUND3 "measurement traps").
  ``overlap_efficiency_med`` — the MEDIAN of per-rep ratios, the number of
  record (the max is upward-biased: reps whose calibration leg catches
  contention inflate their ratio and max selects them — VERDICT r4 #2).
* ``vr_decode_only_s`` / ``vr_overlap_efficiency[_med]`` — same pairing
  for the VR scenario (its ceiling is 4K h264 decode).
* ``host_cores`` — os.cpu_count(); ``threads_x_realtime`` /
  ``threads1_x_realtime`` — the headline clip with an explicit
  ``threads=host_cores`` vs ``threads=1`` sharded-decode run (both
  best-of-3 paired), reported only when the box has >1 core (0.0
  otherwise): the decode-scaling datapoint the 20x target depends on
  (VERDICT r3 #3).
* ``codec`` — "h264" (native encoder) or "mp4v" (fallback).

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


def _native_encoder():
    try:
        from funscript_flow_tpu import runtime as rt

        if rt.encoder_available("libx264"):
            return rt
    except Exception:
        pass
    return None


def make_bench_video(path: str, seconds: float, h: int = 1080, w: int = 1920,
                     seed: int = 0, codec: str = "h264",
                     fps: int = FPS) -> str:
    """Synthetic oscillating-zoom content; returns the codec actually used."""
    import cv2

    n = int(seconds * fps)
    rng = np.random.default_rng(seed)
    # >=4K (VR) fixtures render a LOCALIZED radial pulse at quarter res and
    # upscale (full-res 2x-supersampled warps cost seconds/frame at 4K).
    # Two measured pathologies drove this design (VERDICT r4 #5, round-5
    # sweeps in NOTES_ROUND5):
    # * the old cheap-pan texture's analysis-plane signal (0.6-2.3 gray
    #   levels after upscale + VR quadrant crop + 256 resize) sat BELOW the
    #   fast engine's ~1.5-level luma dither, so funscript-level fast-vs-
    #   exact deltas measured normalization-amplified noise;
    # * a UNIFORM zoom has spatially flat divergence, so the pipeline's
    #   divergence-argmax center is degenerate — decode dither flipped the
    #   chosen center up to 80 px between engines (center |delta| p95 =
    #   59 px), and dots computed about different centers diverged ~27% of
    #   signal no matter how strong the texture (pos p95 stuck at 11-15).
    # The pulse (Gaussian-envelope radial expansion centered in the
    # analyzed bottom-half-of-left-eye region) peaks the divergence at a
    # definite point: both engines lock the same center and fast-vs-exact
    # pos |delta| measured p95 1, max 2. The texture is contrast-stretched
    # sharp-ish noise (sigma 2 at quarter res ~= sigma 8 at 4K — still soft
    # vs real footage): 8.4 analysis-plane gray levels of inter-frame
    # signal vs the 1.5-level dither. The 1080p headline fixtures keep the
    # original affine-zoom synthesis bit-identical for cross-round
    # comparability.
    cheap = h * w > 4_000_000
    rh, rw = (h // 4, w // 4) if cheap else (h, w)

    def make_tex(shape):
        t = cv2.GaussianBlur(
            (rng.random(shape) * 255).astype(np.float32), (0, 0),
            2 if cheap else 5)
        if cheap:
            lo, hi = float(t.min()), float(t.max())
            t = (t - lo) * (255.0 / max(hi - lo, 1e-6))
        return t

    if cheap:
        # radial-pulse displacement field on the render-res plane; the
        # envelope center sits at the middle of the VR-analyzed region
        # (bottom half of the left eye: x in [0, w/2], y in [h/2, h])
        cx, cy, R = rw * 0.25, rh * 0.75, 80.0
        yy, xx = np.mgrid[0:rh, 0:rw].astype(np.float32)
        dx0, dy0 = xx - cx, yy - cy
        env = np.exp(-(dx0 * dx0 + dy0 * dy0) / (2 * R * R)).astype(np.float32)
        tex = make_tex((rh, rw))
    else:
        tex = make_tex((rh * 2, rw * 2))

    rt = _native_encoder() if codec == "h264" else None
    if rt is not None:
        enc = rt.VideoEncoder(path, w, h, float(fps), codec="libx264",
                              gop=250, bframes=3)
        used = "h264"
    else:
        enc = None
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
        if not vw.isOpened():
            raise RuntimeError("no usable encoder")
        used = "mp4v"

    for i in range(n):
        if i == n // 2:
            tex = make_tex(tex.shape)
        if cheap:
            s = 0.4 * np.sin(2 * np.pi * i / 45.0)
            wob = 3.0 * np.sin(2 * np.pi * i / 200.0)
            mx = (xx - s * dx0 * env - wob).astype(np.float32)
            my = (yy - s * dy0 * env).astype(np.float32)
            img = cv2.remap(tex, mx, my, cv2.INTER_LINEAR,
                            borderMode=cv2.BORDER_REFLECT)
            img = cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
        else:
            s = float(np.exp(0.05 * np.sin(2 * np.pi * i / 45.0)))
            M = cv2.getRotationMatrix2D((rw, rh), 0, s)
            M[0, 2] += 3.0 * np.sin(2 * np.pi * i / 200.0)
            img = cv2.warpAffine(tex, M, (rw * 2, rh * 2))[
                rh // 2 : rh // 2 + rh, rw // 2 : rw // 2 + rw]
        bgr = cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8), cv2.COLOR_GRAY2BGR)
        if enc is not None:
            enc.write(bgr)
        else:
            vw.write(bgr)
    if enc is not None:
        enc.close()
    else:
        vw.release()
    return used


def _decode_only(clip, vr_mode=False):
    """One raw pump decode pass of ``clip`` (no device work, fast engine):
    the host decode floor in the CURRENT pool window. inf if unavailable."""
    try:
        from funscript_flow_tpu import runtime as nrt

        if not nrt.available():
            return float("inf")
        t0 = time.time()
        src = nrt.NativeFrameSource(clip, meta=None, vr_mode=vr_mode,
                                    gray=True, fast=True)
        while src.get_batch(256):
            pass
        src.close()
        return time.time() - t0
    except Exception:
        return float("inf")


def _timed_runs(process_video, clip, params, n_runs, duration, vr_mode=False,
                paired=True):
    """Best-of-N single-clip runs, each IMMEDIATELY followed by a raw-decode
    calibration rep of the same clip (same pool window), so the per-rep
    ratio ``cal_i / wall_i`` measures pipeline overlap quality independent
    of shared-pool weather. Returns a dict or None on error."""
    walls, splits, cals = [], [], []
    for _ in range(n_runs):
        rep = _single_rep(process_video, clip, params, vr_mode, paired)
        if rep is None:
            return None
        walls.append(rep[0])
        splits.append(rep[1])
        cals.append(rep[2])
    return _stats(walls, splits, cals, duration)


_TIMER_RE = re.compile(r"decode_wait=([0-9.]+)s device_compute=([0-9.]+)s")


def _single_rep(process_video, clip, params, vr_mode=False, paired=True):
    """One e2e run of ``clip`` IMMEDIATELY followed by a raw-decode
    calibration rep in the same pool window. Returns
    ``(wall, (decode_wait, device_compute), cal)`` or None on error."""
    lines = []
    t0 = time.time()
    err = process_video(clip, params, log_func=lines.append)
    wall = time.time() - t0
    if err:
        return None
    m = next((_TIMER_RE.search(ln) for ln in lines if _TIMER_RE.search(ln)),
             None)
    split = (float(m.group(1)), float(m.group(2))) if m else (0.0, 0.0)
    cal = _decode_only(clip, vr_mode) if paired else float("inf")
    return wall, split, cal


def _stats(walls, splits, cals, duration):
    """Best-of-N + paired-efficiency stats over collected reps."""
    best = int(np.argmin(walls))
    ratios = [min(c / w, 1.0) for c, w in zip(cals, walls) if np.isfinite(c)]
    finite = [c for c in cals if np.isfinite(c)]
    return {
        "x": duration / walls[best],
        "decode_wait": splits[best][0],
        "device_compute": splits[best][1],
        "decode_only": min(finite) if finite else 0.0,
        # best per-rep pair: pool noise moves cal and e2e together within a
        # rep, so the max ratio is the least-contaminated pipeline measure —
        # but it is UPWARD-biased (a rep whose CALIBRATION leg catches pool
        # contention inflates that rep's ratio, and max selects exactly
        # those reps; the r4 VR artifact reported eff=1.0 while the true
        # ratio was ~0.73, VERDICT r4 weak #1). The MEDIAN of per-rep
        # ratios is the number of record; max is kept as the optimistic
        # upper envelope.
        "efficiency": max(ratios) if ratios else 0.0,
        "efficiency_med": float(np.median(ratios)) if ratios else 0.0,
    }


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from funscript_flow_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    from funscript_flow_tpu.models.pipeline import PipelineConfig
    from funscript_flow_tpu.runner import process_video, run_headless
    from funscript_flow_tpu.utils.params import Params

    os.makedirs(BENCH_DIR, exist_ok=True)
    codec = "h264" if _native_encoder() is not None else "mp4v"
    # codec-specific folder: a stale folder from a bench run with the other
    # codec must not leak extra clips into the folder scenario's timing
    folder = os.path.join(BENCH_DIR, f"folder_{codec}")
    os.makedirs(folder, exist_ok=True)
    main_clip = os.path.join(BENCH_DIR, f"clip_main_{codec}.mp4")
    if not os.path.exists(main_clip):
        make_bench_video(main_clip, DURATION_S, codec=codec)
    folder_specs = [(f"a_20s_1080p_{codec}.mp4", 20.0, 1080, 1920, 1),
                    (f"b_12s_1080p_{codec}.mp4", 12.0, 1080, 1920, 2),
                    (f"c_8s_720p_{codec}.mp4", 8.0, 720, 1280, 3)]
    for name, secs, h, w, seed in folder_specs:
        p = os.path.join(folder, name)
        if not os.path.exists(p):
            make_bench_video(p, secs, h, w, seed, codec=codec)
    mp4v_clip = os.path.join(BENCH_DIR, "clip_main_mp4v.mp4")
    if codec == "h264" and not os.path.exists(mp4v_clip):
        make_bench_video(mp4v_clip, DURATION_S, codec="mp4v")
    # "pulse" suffix: round-5 signal-representative VR fixtures (localized
    # radial pulse, contrast-stretched texture — see make_bench_video) —
    # must not reuse a stale cheap-pan or uniform-zoom clip cached under an
    # old name
    vr_clip = os.path.join(BENCH_DIR, f"clip_vr4k_pulse_{codec}.mp4")
    vr_secs = 6.0
    if codec == "h264" and not os.path.exists(vr_clip):
        make_bench_video(vr_clip, vr_secs, h=1920, w=3840, seed=4, codec=codec)
    vr60_clip = os.path.join(BENCH_DIR, f"clip_vr4k60_pulse_{codec}.mp4")
    if codec == "h264" and not os.path.exists(vr60_clip):
        make_bench_video(vr60_clip, vr_secs, h=1920, w=3840, seed=5,
                         codec=codec, fps=60)

    params = Params(overwrite=True)

    # Warm up compilation for the production shapes the scenarios actually
    # dispatch (the production path ships grayscale; warming RGB would
    # compile a program the run never uses). The 20 s clip partitions as
    # 60+240+240+59 -> buckets {240, 60}; the VR clips (179 pairs) use
    # {60}; the folder's 8 s clip (239 pairs) adds the 120 bucket. Going
    # through runner.prewarm_shapes registers the shapes so the timed
    # runs' per-clip prewarm threads see them as warm and spawn nothing.
    from funscript_flow_tpu.ops.reductions import CENTER_SMOOTH_RADIUS
    from funscript_flow_tpu.runner import prewarm_shapes

    cfg = PipelineConfig(pair_batch=params.pair_batch)
    prewarm_shapes(cfg, CENTER_SMOOTH_RADIUS,
                   (params.pair_batch, params.pair_batch // 2,
                    params.pair_batch // 4, params.pair_batch // 8))

    # --- scenarios 1+2 INTERLEAVED (round 5): the headline single-clip
    # reps and the folder reps alternate, so both scenarios draw from the
    # same pool-weather windows and ``folder_x_realtime`` vs ``value`` is a
    # fair comparison (r4: the two scenarios ran minutes apart and pool
    # drift, not the pipeline, decided which looked faster). Each e2e rep
    # of either kind is still IMMEDIATELY paired with its own raw-decode
    # calibration rep (shared-pool noise: back-to-back identical runs vary
    # 10-30%, with occasional multi-x spikes; min-of-N converges for the
    # absolute number and the per-rep pairing makes the efficiency ratios
    # noise-robust). Headline: 20 s 1080p30 h264 single clip. Folder: the
    # reference's actual workload shape — 3 mixed clips, clip_workers
    # auto. ---
    total_secs = sum(s for _, s, _, _, _ in folder_specs)
    folder_clips = [os.path.join(folder, name) for name, *_ in folder_specs]

    def folder_rep(run_params):
        """One folder e2e run + same-window sequential folder decode cal."""
        t0 = time.time()
        err = run_headless(folder, run_params,
                           log_path=os.path.join(BENCH_DIR, "run.log"))
        wall = time.time() - t0
        if err:
            return None
        return wall, sum(_decode_only(c) for c in folder_clips)

    s_walls, s_splits, s_cals = [], [], []
    f_walls, f_cals = [], []
    for _ in range(6):
        rep = _single_rep(process_video, main_clip, params)
        if rep is not None:
            s_walls.append(rep[0])
            s_splits.append(rep[1])
            s_cals.append(rep[2])
        frep = folder_rep(params)
        if frep is not None:
            f_walls.append(frep[0])
            f_cals.append(frep[1])
    if not s_walls:
        print(json.dumps({"metric": "bench_error", "value": 0, "unit": "", "vs_baseline": 0}))
        return
    r = _stats(s_walls, s_splits, s_cals, DURATION_S)
    x_rt, decode_wait, device_compute = r["x"], r["decode_wait"], r["device_compute"]
    decode_only, overlap_eff = r["decode_only"], r["efficiency"]
    overlap_eff_med = r["efficiency_med"]
    n_pairs = int(DURATION_S * FPS) - 1
    pairs_per_s = n_pairs / max(device_compute, 1e-9)

    # --- scenario 1b: sharded decode scaling (only meaningful with >1 host
    # core): an EXPLICIT threads=host_cores run vs an explicit threads=1
    # run, both best-of-3 paired — symmetric legs, correctly labeled even
    # on >8-core hosts where the headline's default threads=8 clamp would
    # otherwise masquerade as a host_cores datapoint ---
    host_cores = os.cpu_count() or 1
    threads_x_rt = threads1_x_rt = 0.0
    if host_cores > 1:
        rn = _timed_runs(process_video, main_clip,
                         Params(overwrite=True, threads=host_cores), 3,
                         DURATION_S)
        threads_x_rt = rn["x"] if rn else 0.0
        r1 = _timed_runs(process_video, main_clip,
                         Params(overwrite=True, threads=1), 3, DURATION_S)
        threads1_x_rt = r1["x"] if r1 else 0.0

    # --- scenario 2 stats: the folder reps were collected interleaved with
    # the headline reps above (VERDICT r4 #2/#3: same-window calibration
    # pairing AND same-weather folder-vs-single comparison) ---
    if f_walls:
        fr = _stats(f_walls, [(0.0, 0.0)] * len(f_walls), f_cals, total_secs)
        folder_x_rt, folder_decode_only = fr["x"], fr["decode_only"]
        folder_eff, folder_eff_med = fr["efficiency"], fr["efficiency_med"]
    else:
        folder_x_rt = folder_decode_only = folder_eff = folder_eff_med = 0.0

    # --- scenario 2b: clip-workers scaling (only meaningful with >1 host
    # core, where auto runs cores+1 in-flight clips): an explicit
    # clip_workers=1 sequential run vs the auto run above — the folder
    # half of the multi-core evidence row (VERDICT r4 #3/#7) ---
    folder_seq_x_rt = 0.0
    if host_cores > 1:
        seq_params = Params(overwrite=True, clip_workers=1)
        seq_walls = [w for w, _ in
                     filter(None, (folder_rep(seq_params) for _ in range(3)))]
        if seq_walls:
            folder_seq_x_rt = total_secs / min(seq_walls)

    # --- scenario 3: mp4v comparability point (round-1/2 headline shape) ---
    mp4v_x_rt = 0.0
    if os.path.exists(mp4v_clip):
        r = _timed_runs(process_video, mp4v_clip, params, 4, DURATION_S,
                        paired=False)
        mp4v_x_rt = r["x"] if r else 0.0

    # --- scenario 4: 4K SBS VR clip, vr_mode, best of 5, paired with a
    # same-window raw 4K decode calibration rep (VERDICT r3 #4) ---
    vr_x_rt = vr_decode_only = vr_overlap_eff = vr_overlap_eff_med = 0.0
    if os.path.exists(vr_clip):
        vr_params = Params(overwrite=True, vr_mode=True)
        r = _timed_runs(process_video, vr_clip, vr_params, 5, vr_secs,
                        vr_mode=True)
        if r:
            vr_x_rt, vr_decode_only = r["x"], r["decode_only"]
            vr_overlap_eff = r["efficiency"]
            vr_overlap_eff_med = r["efficiency_med"]

    # --- scenario 4b: the same VR shape at 60 fps (the dominant real VR
    # frame rate): step=2 sampling engages grid-aware per-packet
    # AVDISCARD_NONREF, so off-grid non-reference frames are never
    # decoded — the representative premium workload ---
    vr60_x_rt = vr60_decode_only = vr60_overlap_eff = 0.0
    vr60_overlap_eff_med = 0.0
    if os.path.exists(vr60_clip):
        vr_params = Params(overwrite=True, vr_mode=True)
        r = _timed_runs(process_video, vr60_clip, vr_params, 5, vr_secs,
                        vr_mode=True)
        if r:
            vr60_x_rt, vr60_decode_only = r["x"], r["decode_only"]
            vr60_overlap_eff = r["efficiency"]
            vr60_overlap_eff_med = r["efficiency_med"]

    print(json.dumps({
        "metric": "1080p30 h264 end-to-end (decode+flow+signal+emit) per chip",
        "value": round(x_rt, 2),
        "unit": "x_realtime",
        "vs_baseline": round(x_rt / 1.0, 2),
        "folder_x_realtime": round(folder_x_rt, 2),
        "mp4v_x_realtime": round(mp4v_x_rt, 2),
        "vr_x_realtime": round(vr_x_rt, 2),
        "decode_wait_s": round(decode_wait, 2),
        "device_compute_s": round(device_compute, 2),
        "pairs_per_s": round(pairs_per_s, 1),
        "decode_only_s": round(decode_only, 2),
        # host decode floor expressed as the x-realtime ceiling this box
        # allows: e2e can't beat it, and value << ceiling means the shared
        # vCPU was contended during the e2e runs, not a pipeline regression
        "decode_ceiling_x_realtime": round(
            DURATION_S / decode_only, 2) if decode_only else 0.0,
        "overlap_efficiency": round(overlap_eff, 2),
        "overlap_efficiency_med": round(overlap_eff_med, 2),
        "folder_decode_only_s": round(folder_decode_only, 2),
        "folder_overlap_efficiency": round(folder_eff, 2),
        "folder_overlap_efficiency_med": round(folder_eff_med, 2),
        "folder_seq_x_realtime": round(folder_seq_x_rt, 2),
        "vr_decode_only_s": round(vr_decode_only, 2),
        "vr_overlap_efficiency": round(vr_overlap_eff, 2),
        "vr_overlap_efficiency_med": round(vr_overlap_eff_med, 2),
        "vr60_x_realtime": round(vr60_x_rt, 2),
        "vr60_decode_only_s": round(vr60_decode_only, 2),
        "vr60_overlap_efficiency": round(vr60_overlap_eff, 2),
        "vr60_overlap_efficiency_med": round(vr60_overlap_eff_med, 2),
        "host_cores": host_cores,
        "threads_x_realtime": round(threads_x_rt, 2),
        "threads1_x_realtime": round(threads1_x_rt, 2),
        "codec": codec,
    }))


if __name__ == "__main__":
    main()
