"""Aux subsystems: params/config/strings/logging/preview (SURVEY.md §5)."""

import json
import os

import numpy as np
import pytest

from funscript_flow_tpu.utils.params import Params
from funscript_flow_tpu.utils.config import save_config, load_config
from funscript_flow_tpu.utils.strings import load_strings
from funscript_flow_tpu.utils.logging import RunLogger, StageTimers
from funscript_flow_tpu.io.funscript import write_funscript, load_funscript, funscript_path
from funscript_flow_tpu.gui.preview import render_preview_html, write_preview


def test_params_reference_backend_aliases():
    assert Params(backend="CPU").backend == "TPU"
    assert Params(backend="CUDA").backend == "TPU"
    assert Params(backend="OpenCL").backend == "TPU"
    assert Params(backend="DNN").backend == "DIS"
    with pytest.raises(ValueError):
        Params(backend="vulkan")


def test_params_defaults_match_reference_cli():
    p = Params()
    assert (p.threads, p.detrend_window, p.norm_window, p.batch_size) == (8, 2.0, 3.0, 3000)
    assert p.keyframe_reduction and not p.overwrite and p.cut_threshold == 7.0


def test_config_roundtrip(tmp_path):
    p = Params(detrend_window=1.5, vr_mode=True, cut_threshold=5.0)
    cfg = tmp_path / "config.json"
    save_config(p, str(cfg))
    q = load_config(str(cfg))
    assert q == p


def test_config_missing_and_corrupt(tmp_path):
    assert load_config(str(tmp_path / "absent.json")) == Params()
    bad = tmp_path / "bad.json"
    bad.write_text("{nope")
    assert load_config(str(bad)) == Params()
    # unknown keys ignored
    extra = tmp_path / "extra.json"
    extra.write_text(json.dumps({"vr_mode": True, "future_knob": 1}))
    assert load_config(str(extra)).vr_mode is True


def test_config_reference_shaped(tmp_path):
    """A config.json written by the REFERENCE app loads correctly: its
    save_config persists QLineEdit text (numerics as strings) and the
    backend combo's display text, which may carry an " (unavailable)"
    annotation (FunscriptFlow.pyw:2266-2281, 2022-2036)."""
    ref_cfg = tmp_path / "config.json"
    ref_cfg.write_text(json.dumps({
        "threads": "12",
        "detrend_window": "1.5",
        "norm_window": "4",
        "batch_size": "2000",
        "overwrite": True,
        "vr_mode": False,
        "pov_mode": True,
        "backend": "DNN (unavailable)",
        "keyframe_reduction": True,
    }))
    p = load_config(str(ref_cfg))
    assert p.threads == 12
    assert p.detrend_window == 1.5
    assert p.norm_window == 4.0
    assert p.batch_size == 2000
    assert p.overwrite and p.pov_mode and not p.vr_mode
    assert p.backend == "DIS"  # DNN alias, annotation stripped
    assert p.keyframe_reduction

    # one bad value doesn't discard the rest of the config
    part = tmp_path / "partial.json"
    part.write_text(json.dumps({"threads": "lots", "vr_mode": True}))
    q = load_config(str(part))
    assert q.threads == 8 and q.vr_mode is True


def test_strings_override(tmp_path):
    s = load_strings(str(tmp_path / "none.json"))
    assert "{n}" in s["found_files"]
    over = tmp_path / "strings.json"
    over.write_text(json.dumps({"found_files": "J'ai trouvé {n} fichier(s)."}))
    s2 = load_strings(str(over))
    assert s2["found_files"].startswith("J'ai")
    assert s2["batch_processing_complete"] == s["batch_processing_complete"]


def test_run_logger(tmp_path):
    with RunLogger(logs_dir=str(tmp_path / "logs"), to_stdout=False) as log:
        log("hello")
        path = log.path
    assert open(path).read() == "hello\n"
    assert os.path.dirname(path).endswith("logs")


def test_stage_timers():
    t = StageTimers()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    assert t.report()["a"] >= 0


def test_funscript_roundtrip(tmp_path):
    p = tmp_path / "x.funscript"
    actions = [{"at": 0, "pos": 50}, {"at": 100, "pos": 10}]
    write_funscript(str(p), actions)
    data = load_funscript(str(p))
    assert data == {"version": "1.0", "actions": actions}
    assert funscript_path("/a/b/video.mp4") == "/a/b/video.funscript"


def test_preview_html(tmp_path):
    actions = [{"at": 0, "pos": 10}, {"at": 500, "pos": 90}]
    html = render_preview_html("clip.mp4", actions)
    assert "clip.mp4" in html and json.dumps(actions) in html
    assert "canvas" in html and "scriptValue" in html
    # write_preview reads the funscript next to the video
    video = tmp_path / "clip.mp4"
    video.write_bytes(b"")
    write_funscript(str(tmp_path / "clip.funscript"), actions)
    out = write_preview(str(video))
    assert out.endswith(".preview.html") and os.path.exists(out)


def test_strings_keys_reference_compatible():
    """A strings.json written for the reference must apply: every key the
    reference's table defines (FunscriptFlow.pyw:346-381) exists here under
    the same name, and every key our runner formats is defined."""
    s = load_strings("/nonexistent.json")
    reference_keys = [
        "app_title", "select_videos", "select_folder", "no_files_selected",
        "vr_mode", "vr_mode_tooltip", "overall_progress",
        "current_video_progress", "advanced_settings", "threads",
        "detrend_window", "norm_window", "batch_size", "show_preview",
        "show_advanced", "overwrite_files", "run", "cancel", "readme",
        "config_saved", "config_load_error", "no_files_warning",
        "cancelled_by_user", "batch_processing_complete", "funscript_saved",
        "skipping_file_exists", "log_error", "found_files",
        "processing_file", "processing_completed_with_errors",
        "pov_mode_tooltip",
    ]
    missing = [k for k in reference_keys if k not in s]
    assert not missing, missing
    # placeholder contracts used by the runner
    s["skipping_file_exists"].format(video_path="a", output_path="b")
    s["funscript_saved"].format(output_path="b")
    s["processing_file"].format(current=1, total=2, video_path="x")
    s["found_files"].format(n=3)
    s["log_error"].format(error="e")
    s["mesh_devices"].format(n=4, platform="cpu")


def test_expand_dropped_paths_nonrecursive_quirk(tmp_path):
    """Dropped folders scan ONE level (reference :2511-2516), unlike the
    recursive folder button."""
    from funscript_flow_tpu.gui.app import expand_dropped_paths

    (tmp_path / "a.mp4").touch()
    (tmp_path / "b.txt").touch()
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "c.mkv").touch()
    got = expand_dropped_paths([str(tmp_path), str(sub / "c.mkv"), str(tmp_path / "b.txt")])
    assert got == [str(tmp_path / "a.mp4"), str(sub / "c.mkv")]


def test_paths_from_clipboard_text(tmp_path):
    """Ctrl+V fallback: newline lists and file:// URIs resolve to existing
    paths through the same one-level folder expansion as real drops."""
    from funscript_flow_tpu.gui.app import paths_from_clipboard_text

    (tmp_path / "a.mp4").touch()
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "c.mkv").touch()
    text = (f"file://{sub / 'c.mkv'}\r\n{tmp_path}\n\n"
            f"{tmp_path / 'missing.mp4'}\n")
    got = paths_from_clipboard_text(text)
    assert got == [str(sub / "c.mkv"), str(tmp_path / "a.mp4")]


# --- intra-video checkpoint sidecars (io/checkpoint.py) ---------------------

def test_checkpoint_roundtrip_and_invalidation(tmp_path):
    import numpy as np

    from funscript_flow_tpu.io import checkpoint as ck

    path = str(tmp_path / "x.funscript.ckpt.npz")
    dots = np.arange(10, dtype=np.float32)
    cuts = np.zeros(10, bool)
    cuts[3] = True
    ck.save(path, dots, cuts, "fp-a")
    got = ck.load(path, "fp-a")
    assert got is not None
    np.testing.assert_array_equal(got[0], dots)
    np.testing.assert_array_equal(got[1], cuts)
    # different fingerprint (video changed / params changed): no resume
    assert ck.load(path, "fp-b") is None
    # corrupt file: no resume, no raise
    with open(path, "wb") as f:
        f.write(b"not an npz")
    assert ck.load(path, "fp-a") is None
    # missing file
    ck.clear(path)
    assert ck.load(path, "fp-a") is None
    ck.clear(path)  # idempotent


def test_checkpoint_fingerprint_sensitivity(tmp_path):
    from funscript_flow_tpu.io import checkpoint as ck
    from funscript_flow_tpu.io.decode import VideoMeta

    video = tmp_path / "v.mp4"
    video.write_bytes(b"0" * 100)
    meta = VideoMeta(total_frames=60, fps=30.0, width=64, height=64)
    base = ck.fingerprint(str(video), meta, Params())
    assert ck.fingerprint(str(video), meta, Params()) == base
    # per-pair-affecting params change it; irrelevant ones don't
    assert ck.fingerprint(str(video), meta, Params(cut_threshold=9)) != base
    assert ck.fingerprint(str(video), meta, Params(vr_mode=True)) != base
    assert ck.fingerprint(str(video), meta, Params(pair_batch=32)) == base
    assert ck.fingerprint(str(video), meta, Params(threads=2)) == base
    # numeric-regime components (round-3 verdict weak #4 + advisor):
    # resolved decode engine — a fast-engine sidecar must not resume onto
    # the exact path (silent .so-failure fallback) or vice versa
    p = Params()
    assert ck.fingerprint(str(video), meta, p, engine="fast") \
        != ck.fingerprint(str(video), meta, p, engine="exact")
    # resolved warp backend: pallas (exact f32) vs xla (bfloat16 default)
    assert ck.fingerprint(str(video), meta, Params(warp_backend="pallas")) \
        != ck.fingerprint(str(video), meta, Params(warp_backend="xla"))
    # resolved pallas fusion (fused polyexp agrees with XLA only to ~1e-4)
    assert ck.fingerprint(str(video), meta, Params(use_pallas="on")) \
        != ck.fingerprint(str(video), meta, Params(use_pallas="off"))
    # on this CPU test platform "auto" resolves to off/xla — same stream,
    # same fingerprint
    assert ck.fingerprint(str(video), meta, Params(use_pallas="off",
                                                   warp_backend="xla")) == base
    # file content change
    video.write_bytes(b"1" * 101)
    assert ck.fingerprint(str(video), meta, Params()) != base


def test_checkpoint_fingerprint_resolved_engine(tmp_path, monkeypatch):
    """default_engine tracks the RUNTIME's actual availability: the same
    Params fingerprint differently when the native pump stops being
    importable (the advisor's resolved-engine hole — decode_quality='fast'
    silently falls back to the exact cv2 path when the .so is missing)."""
    from funscript_flow_tpu.io import checkpoint as ck
    from funscript_flow_tpu import runtime as rt

    p_fast = Params(decode_quality="fast")
    if rt.available():
        assert ck.default_engine(p_fast) == "fast"
    monkeypatch.setattr(rt, "available", lambda: False)
    assert ck.default_engine(p_fast) == "exact"
    assert ck.default_engine(Params(decode_quality="exact")) == "exact"
    assert ck.default_engine(Params(use_native_decode="off")) == "exact"


def test_resolve_clip_workers(monkeypatch):
    """Folder-run worker/device resolution (VERDICT r3 #7, r4 #3): auto =
    one clip per chip with a mesh, min(cores+1, 4) in-flight clips on a
    single chip (when the native pump exists), strictly sequential on
    explicit clip_workers=1; explicit counts clamp to the file count."""
    import os as _os

    from funscript_flow_tpu import runner
    from funscript_flow_tpu import runtime as rt

    native = False
    try:
        native = rt.available()
    except Exception:
        pass

    # explicit counts: honored, clamped to files; devices follow mesh
    assert runner.resolve_clip_workers(Params(clip_workers=1), 5) == (1, 1)
    assert runner.resolve_clip_workers(Params(clip_workers=3), 5) == (3, 1)
    assert runner.resolve_clip_workers(Params(clip_workers=9), 5) == (5, 1)
    assert runner.resolve_clip_workers(
        Params(clip_workers=4, mesh=2), 5) == (4, 2)
    # auto, multi-chip: one clip per chip (devices clamp to files too)
    assert runner.resolve_clip_workers(Params(mesh=3), 5) == (3, 3)
    assert runner.resolve_clip_workers(Params(mesh=3), 2) == (2, 2)
    # auto, single chip: cores+1 (capped at 4) in-flight clips iff the
    # native pump is up — core-aware shape, exercised for 1/3/16 cores
    for cores, want in ((1, 2), (3, 4), (16, 4)):
        monkeypatch.setattr(_os, "cpu_count", lambda c=cores: c)
        expect = want if native else 1
        assert runner.resolve_clip_workers(Params(), 5) == (expect, 1)
    monkeypatch.undo()
    # one file never parallelizes
    assert runner.resolve_clip_workers(Params(), 1) == (1, 1)
    # native pump forced off -> sequential even in auto
    assert runner.resolve_clip_workers(
        Params(use_native_decode="off"), 5) == (1, 1)


def test_checkpoint_fingerprint_slf_override(tmp_path, monkeypatch):
    """FF_PUMP_SLF bitwise changes fast-engine decode output, so a
    fast-engine sidecar written under one override must not resume under
    another; the exact engine never loop-filter-skips, so its sidecars
    ignore the env var (code-review r4 finding)."""
    from funscript_flow_tpu.io import checkpoint as ck
    from funscript_flow_tpu.io.decode import VideoMeta

    video = tmp_path / "v.mp4"
    video.write_bytes(b"0" * 100)
    meta = VideoMeta(total_frames=60, fps=30.0, width=64, height=64)

    monkeypatch.delenv("FF_PUMP_SLF", raising=False)
    fast_auto = ck.fingerprint(str(video), meta, Params(), engine="fast")
    exact_auto = ck.fingerprint(str(video), meta, Params(), engine="exact")
    monkeypatch.setenv("FF_PUMP_SLF", "all")
    assert ck.fingerprint(str(video), meta, Params(),
                          engine="fast") != fast_auto
    assert ck.fingerprint(str(video), meta, Params(),
                          engine="exact") == exact_auto
    monkeypatch.setenv("FF_PUMP_SLF", "")  # empty = auto (falsy)
    assert ck.fingerprint(str(video), meta, Params(),
                          engine="fast") == fast_auto


def test_prewarm_registry_thread_safe(monkeypatch):
    """Two clips' prewarm threads must not race _PREWARMED's check-then-act
    into compiling the same shape twice: each shape's check + execute + add
    is atomic under DEVICE_LOCK (relay-wedge deadlock fix, NOTES_ROUND5).
    Eight threads warming the same bucket list must execute each shape
    exactly once."""
    import threading

    from funscript_flow_tpu import runner

    calls = []
    lock_sanity = threading.Lock()

    class _Ready:
        def block_until_ready(self):
            return self

    def fake_program(frames, n_pairs, cfg):
        # no two executes may overlap (the relay client wedges on
        # concurrent blocking device calls) — assert mutual exclusion
        assert lock_sanity.acquire(blocking=False), "concurrent execute"
        try:
            calls.append(frames.shape[0])
        finally:
            lock_sanity.release()
        return {"dots": _Ready()}

    monkeypatch.setattr(runner, "flow_chunk_program", fake_program)
    monkeypatch.setattr(runner, "_PREWARMED", set())

    cfg = runner.PipelineConfig(pair_batch=64)
    buckets = [16, 32]
    threads = [
        threading.Thread(target=runner.prewarm_shapes,
                         args=(cfg, 6, list(buckets)))
        for _ in range(8)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert not any(t.is_alive() for t in threads)
    # each bucket executed exactly once across all 8 threads
    assert sorted(calls) == sorted(b + 2 * 6 + 1 for b in buckets)
    assert len(runner._PREWARMED) == 2
