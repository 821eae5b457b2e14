"""Run parameters — the framework's config surface.

Mirrors the reference's settings dict (FunscriptFlow.pyw:2654-2664) plus the
undocumented ``cut_threshold`` config key (:858,876) and TPU-specific knobs.
CLI defaults match the reference CLI (:2644-2652); note the reference GUI
used different defaults (detrend 1.5, norm 4 — SURVEY.md §2.1 #22), which we
do not replicate: one set of defaults, the CLI's.
"""

from __future__ import annotations

from dataclasses import dataclass, asdict, fields

__all__ = ["Params"]

# reference backend names accepted for drop-in compatibility; all map to the
# TPU device path (the reference silently falls back CPU<-GPU, :858-874; we
# "fall forward" to the device)
_BACKEND_ALIASES = {"CPU": "TPU", "CUDA": "TPU", "OPENCL": "TPU", "DNN": "DIS"}


@dataclass
class Params:
    threads: int = 8                 # host decode concurrency (reference :2644)
    detrend_window: float = 2.0      # seconds (reference :2645)
    norm_window: float = 3.0         # seconds (reference :2646)
    batch_size: int = 3000           # host decode read-ahead depth in frames
                                     # (reference's frames-per-bracket, :2647 —
                                     # here it bounds prefetch-queue memory)
    overwrite: bool = False
    vr_mode: bool = False
    pov_mode: bool = False
    keyframe_reduction: bool = True
    backend: str = "TPU"             # TPU | DIS (+ reference aliases)
    cut_threshold: float = 7.0       # config-only key in the reference (:876)
    signal_backend: str = "auto"     # auto | host | device
    pair_batch: int = 240            # device micro-batch of frame pairs
    use_native_decode: str = "auto"  # auto | on | off (C++ frame_pump runtime)
    decode_quality: str = "fast"     # fast | exact — fast uses the libav
                                     # lowres+luma-only engine (numerically
                                     # faithful, not bit-identical to cv2;
                                     # validated at the funscript level),
                                     # exact is the cv2-bit-identical path
    use_pallas: str = "auto"         # fused Mosaic kernels: auto | on | off
    warp_backend: str = "auto"       # auto | pallas | xla (Farnebäck warp impl)
    dis_preset: str = "fast"         # ultrafast | fast | medium (DIS backend)
    mesh: int = 0                    # shard pair windows over N devices
                                     # (0/1 = single device; SURVEY §2.4 DP)
    clip_workers: int = 0            # folder mode: concurrent in-flight
                                     # clips (0 = auto: one per chip when
                                     # mesh > 1, else 2 sharing the single
                                     # chip; 1 = strictly sequential). The
                                     # chip is mostly idle at the host
                                     # decode ceiling, so interleaving
                                     # clips' windows into one device queue
                                     # raises folder throughput (runner.
                                     # _run_videos_parallel)
    profile_dir: str = ""            # jax.profiler trace dir ("" = off)
    checkpoint: bool = False         # intra-video resume sidecars
                                     # (io/checkpoint.py; reference only had
                                     # file-level skip-if-exists, :1105-1109)

    def __post_init__(self):
        b = str(self.backend).upper()
        self.backend = _BACKEND_ALIASES.get(b, b)
        if self.backend not in ("TPU", "DIS"):
            raise ValueError(f"Unknown backend: {self.backend}")
        if self.signal_backend not in ("auto", "host", "device"):
            raise ValueError(f"Unknown signal_backend: {self.signal_backend}")
        if self.warp_backend not in ("auto", "pallas", "xla"):
            raise ValueError(f"Unknown warp_backend: {self.warp_backend}")
        if isinstance(self.use_pallas, bool):  # legacy bool accepted
            self.use_pallas = "on" if self.use_pallas else "off"
        if self.use_pallas not in ("auto", "on", "off"):
            raise ValueError(f"Unknown use_pallas: {self.use_pallas}")
        if self.dis_preset not in ("ultrafast", "fast", "medium"):
            raise ValueError(f"Unknown dis_preset: {self.dis_preset}")
        if self.decode_quality not in ("fast", "exact"):
            raise ValueError(f"Unknown decode_quality: {self.decode_quality}")

    @classmethod
    def from_dict(cls, d: dict) -> "Params":
        """Tolerant load, accepting a REFERENCE-shaped config.json too.

        The reference persists raw QLineEdit text, so numeric settings
        arrive as strings ("8", "1.5", "3000"), and the saved backend is
        the combo's display text, which may carry an " (unavailable)"
        annotation (FunscriptFlow.pyw:2266-2281, 2022-2036). Values are
        coerced by field type; an unparseable value keeps its default
        rather than discarding the whole config.
        """
        types = {f.name: f.type for f in fields(cls)}
        out = {}
        for k, v in d.items():
            t = types.get(k)
            if t is None:
                continue  # unknown key (newer/older version): ignore
            try:
                if t in (int, "int"):
                    v = int(float(v))
                elif t in (float, "float"):
                    v = float(v)
                elif t in (bool, "bool") and isinstance(v, str):
                    v = v.strip().lower() in ("1", "true", "yes", "on")
                elif t in (str, "str") and not isinstance(v, (dict, list)):
                    v = str(v)
            except (TypeError, ValueError):
                continue  # unparseable: keep the default
            out[k] = v
        if isinstance(out.get("backend"), str):
            out["backend"] = out["backend"].split(" (")[0].strip()
        return cls(**out)

    def to_dict(self) -> dict:
        return asdict(self)
