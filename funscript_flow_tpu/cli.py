"""Headless CLI — flag-compatible with the reference.

``python -m funscript_flow_tpu.cli <input> [flags]`` mirrors
FunscriptFlow.pyw:2641-2666, plus TPU-specific knobs and the previously
config-only ``--cut_threshold`` (SURVEY.md §7 item 7).

One deliberate fix: the reference declared ``--disable_keyframe_reduction``
with ``action="store_false"`` and then negated it, so keyframe reduction was
OFF by default and the flag turned it ON (:2651, :2662). We implement the
documented intent: reduction on by default, the flag disables it.
"""

from __future__ import annotations

import argparse
import sys

from .runner import run_headless
from .utils.params import Params


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="funscript-flow-tpu", description="Optical Flow to Funscript (TPU)"
    )
    p.add_argument("input", nargs="?", help="Input video file or folder")
    p.add_argument("--threads", type=int, default=8,
                   help="Host decode concurrency (default: 8)")
    p.add_argument("--detrend_window", type=float, default=2.0,
                   help="Detrend window in seconds (default: 2.0)")
    p.add_argument("--norm_window", type=float, default=3.0,
                   help="Normalization window in seconds (default: 3.0)")
    p.add_argument("--batch_size", type=int, default=3000,
                   help="Frames per host bracket (default: 3000)")
    p.add_argument("--overwrite", action="store_true",
                   help="Overwrite existing output files")
    p.add_argument("--vr_mode", action="store_true",
                   help="Enable VR Mode (SBS equirect: analyze bottom half of left eye)")
    p.add_argument("--pov_mode", action="store_true",
                   help="Enable POV Mode (fixed bottom-center motion origin)")
    p.add_argument("--disable_keyframe_reduction", action="store_true",
                   help="Disable keyframe reduction (raw motion export)")
    p.add_argument("--backend",
                   choices=["TPU", "DIS", "CPU", "CUDA", "OpenCL", "DNN"],
                   default="TPU",
                   help="Flow backend; reference names map to TPU/DIS (default: TPU)")
    p.add_argument("--cut_threshold", type=float, default=7.0,
                   help="Scene-cut mean-flow-magnitude threshold (default: 7)")
    p.add_argument("--signal_backend", choices=["auto", "host", "device"],
                   default="auto", help="Where the 1-D signal chain runs")
    p.add_argument("--pair_batch", type=int, default=240,
                   help="Device micro-batch of frame pairs (default: 240)")
    p.add_argument("--use_pallas", choices=["auto", "on", "off"],
                   default="auto",
                   help="Fused Mosaic kernels for polyexp + blur/solve "
                        "(auto = on when running on TPU; measured +36%% pairs/s)")
    p.add_argument("--mesh", type=int, default=0,
                   help="Use N devices: folders run one video per device "
                        "(video-level DP); a single video shards its pair "
                        "windows (jax mesh + shard_map). 0 = single device")
    p.add_argument("--clip_workers", type=int, default=0,
                   help="Folder mode: concurrent in-flight clips (0 = auto: "
                        "one per chip when --mesh > 1, else 2 sharing the "
                        "single chip; 1 = strictly sequential)")
    p.add_argument("--dis_preset", choices=["ultrafast", "fast", "medium"],
                   default="fast",
                   help="DIS backend preset (cv2 equivalents; default: fast)")
    p.add_argument("--warp_backend", choices=["auto", "pallas", "xla"],
                   default="auto",
                   help="Farnebäck warp implementation (auto = Mosaic band-warp "
                        "kernel on TPU, XLA gather elsewhere)")
    p.add_argument("--decode_quality", choices=["fast", "exact"],
                   default="fast",
                   help="fast = libav lowres+luma-only decode (numerically "
                        "faithful, ~2x decode throughput); exact = "
                        "cv2-bit-identical decode")
    p.add_argument("--profile_dir", default="",
                   help="Write a jax.profiler trace of the analysis loop here")
    p.add_argument("--checkpoint", action="store_true",
                   help="Write intra-video resume sidecars (a killed run "
                        "restarts a long video from its last checkpoint "
                        "instead of frame 0; removed on completion)")
    p.add_argument("--log", default="run.log", help="Log file path")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from .utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    if not args.input:
        # no input -> GUI, like the reference (:2665-2668); tkinter-based here
        from .gui.app import launch

        return launch()
    params = Params(
        threads=args.threads,
        detrend_window=args.detrend_window,
        norm_window=args.norm_window,
        batch_size=args.batch_size,
        overwrite=args.overwrite,
        vr_mode=args.vr_mode,
        pov_mode=args.pov_mode,
        keyframe_reduction=not args.disable_keyframe_reduction,
        backend=args.backend,
        cut_threshold=args.cut_threshold,
        signal_backend=args.signal_backend,
        pair_batch=args.pair_batch,
        use_pallas=args.use_pallas,
        warp_backend=args.warp_backend,
        dis_preset=args.dis_preset,
        mesh=args.mesh,
        clip_workers=args.clip_workers,
        decode_quality=args.decode_quality,
        profile_dir=args.profile_dir,
        checkpoint=args.checkpoint,
    )
    any_error = run_headless(args.input, params, log_path=args.log)
    return 1 if any_error else 0


if __name__ == "__main__":
    raise SystemExit(main())
