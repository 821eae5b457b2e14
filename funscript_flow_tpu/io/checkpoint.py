"""Intra-video checkpoint / resume (aux subsystem, SURVEY.md §5).

The reference's only resume mechanism is file-level idempotence: a killed
run reprocesses every unfinished video from frame 0 (skip-if-exists,
FunscriptFlow.pyw:1105-1109) — for a multi-hour video that throws away up
to hours of decode + flow work. Opt-in ``--checkpoint`` persists the
per-pair scalar stream (dots/cuts — the only state the whole-video signal
chain needs, ~5 bytes/pair) to a sidecar next to the output, periodically
and on cancel. A rerun restarts decode ``CENTER_SMOOTH_RADIUS`` pairs
before the saved high-water mark, recomputes and discards that halo (the
±6-pair center smoothing is the only cross-pair coupling in the flow
stage), and continues — the final funscript is BITWISE identical to an
uninterrupted run (tested in tests/test_runner.py).

The sidecar is invalidated by a fingerprint of the video file (size,
mtime, frame count, fps, sampling step) and of every parameter that
influences per-pair values; it is deleted on successful completion.
"""

from __future__ import annotations

import json
import os

import numpy as np

__all__ = ["sidecar_path", "fingerprint", "save", "load", "clear",
           "CHECKPOINT_EVERY_PAIRS"]

#: flush cadence in drained pairs (~2.3 min of 30 fps samples)
CHECKPOINT_EVERY_PAIRS = 4096

_VERSION = 1


def sidecar_path(output_path: str) -> str:
    return output_path + ".ckpt.npz"


def default_engine(params, meta=None) -> str:
    """Best-effort decode-engine class WITHOUT an open source: 'fast' when
    the native pump is importable and fast decode is requested, else
    'exact'. The runner passes the engine of the actually-open source
    instead (``is_fast``) — only the source knows about per-codec fast
    fallback and .so build failures (the resolved-engine hole: a sidecar
    written by the native fast engine must not resume onto the cv2 exact
    path just because the .so stopped building).

    ``meta`` (when available) additionally applies the runner's
    sub-norm-window routing (io.decode.effective_decode_quality): clips
    shorter than the rolling-norm window decode on the exact engine even
    when fast is requested, and their sidecars record that."""
    if str(params.decode_quality) != "fast":
        return "exact"
    if meta is not None:
        from .decode import effective_decode_quality

        if effective_decode_quality(meta, params) != "fast":
            return "exact"
    if str(params.use_native_decode) == "off":
        return "exact"
    try:
        from .. import runtime as _rt

        return "fast" if _rt.available() else "exact"
    except Exception:
        return "exact"


def fingerprint(video_path: str, meta, params, engine: str | None = None) -> str:
    """Identity of (video, analysis settings, numeric regime): a resumed
    run must be computing the same per-pair stream.

    ``pair_batch``/``mesh``/``threads`` are deliberately absent — per-pair
    results are invariant to them (batch/bucket/mesh/shard invariance,
    tested). Caveat (documented limitation): shard invariance excludes a
    container that delivers fewer frames than it advertises — a non-final
    shard black-fills its gap while the sequential resume source stops at
    real EOF, so on such corrupt containers a resumed tail can diverge
    from an uninterrupted threads>1 run.

    What IS fingerprinted beyond video identity + reference params:

    * ``engine`` — the RESOLVED decode engine class ('fast' = libav luma
      engine, 'exact' = cv2-bit-identical; the native exact engine and the
      Python cv2 path are bit-identical — tested — so they share the
      token). Callers with an open source pass its actual engine;
      ``None`` falls back to :func:`default_engine`.
    * ``flow`` — :func:`ops.farneback.resolved_numerics`: JAX platform,
      resolved Pallas fusion, resolved warp backend/dtype. The Pallas warp
      is exact f32 while the XLA warp defaults to bfloat16, so a sidecar
      saved under one regime and resumed under another (e.g. TPU run
      resumed on CPU) would silently stitch two numeric regimes into one
      video.
    """
    from ..ops.farneback import FarnebackConfig, resolved_numerics

    st = os.stat(video_path)
    eng = str(engine) if engine is not None else default_engine(params, meta)
    return json.dumps({
        "size": st.st_size,
        "mtime_ns": st.st_mtime_ns,
        "total_frames": int(meta.total_frames),
        "fps": float(meta.fps),
        "step": int(meta.step),
        "vr_mode": bool(params.vr_mode),
        "pov_mode": bool(params.pov_mode),
        "backend": str(params.backend),
        "dis_preset": str(params.dis_preset),
        "cut_threshold": float(params.cut_threshold),
        "engine": eng,
        # FF_PUMP_SLF overrides the fast engine's loop-filter policy and
        # bitwise changes decoded frames (frame_pump.cpp; tested on the
        # >=6 MP gate fixture), so a sidecar written under one override
        # must not resume under another. Under "auto" the gate resolves
        # deterministically from the clip itself; the exact engine never
        # loop-filter-skips, so its sidecars ignore the env var.
        "slf": ((os.environ.get("FF_PUMP_SLF") or "auto")
                if eng == "fast" else "n/a"),
        "flow": resolved_numerics(FarnebackConfig(
            use_pallas=params.use_pallas, warp_backend=params.warp_backend)),
    }, sort_keys=True)


def save(path: str, dots: np.ndarray, cuts: np.ndarray, fp: str) -> None:
    """Atomic write (tmp + rename): a crash mid-save leaves the previous
    checkpoint intact."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, version=_VERSION, fingerprint=fp,
                 dots=np.asarray(dots, np.float32),
                 cuts=np.asarray(cuts, bool))
    os.replace(tmp, path)


def load(path: str, fp: str):
    """(dots, cuts) from a valid matching sidecar, else None. Missing,
    corrupt, stale-fingerprint, or future-version files are all treated
    as "no checkpoint" — resume is best-effort by design."""
    if not os.path.exists(path):
        return None
    try:
        with np.load(path, allow_pickle=False) as z:
            if int(z["version"]) != _VERSION or str(z["fingerprint"]) != fp:
                return None
            dots = np.asarray(z["dots"], np.float32)
            cuts = np.asarray(z["cuts"], bool)
    except Exception:
        return None
    if dots.shape != cuts.shape or dots.ndim != 1:
        return None
    return dots, cuts


def clear(path: str) -> None:
    try:
        os.remove(path)
    except OSError:
        pass
