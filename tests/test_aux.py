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
