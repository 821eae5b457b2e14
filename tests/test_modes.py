"""VR and POV mode end-to-end coverage (reference modes, SURVEY §2.1 #5, #7)."""

import cv2
import numpy as np
import pytest

import reference_cv as ref
from funscript_flow_tpu.io import decode as iodec
from funscript_flow_tpu.io.funscript import load_funscript
from funscript_flow_tpu.models.pipeline import PipelineConfig, FlowAnalyzer
from funscript_flow_tpu.runner import process_video
from funscript_flow_tpu.utils.params import Params

pytestmark = pytest.mark.slow  # golden/e2e: minutes, not seconds


def write_video(path, frames_rgb, fps=30):
    h, w = frames_rgb[0].shape[:2]
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for f in frames_rgb:
        vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    vw.release()


def test_vr_mode_end_to_end(tmp_path):
    """SBS-style frame with the motion pattern in the bottom-left quadrant
    (= bottom half of the left eye): VR mode must recover the stroke."""
    pattern = ref.make_synthetic_frames(40, h=240, w=240, period=10, seed=8)
    frames = []
    rng = np.random.default_rng(0)
    static = (rng.random((480, 480, 3)) * 255).astype(np.uint8)
    for p in pattern:
        f = static.copy()
        f[240:, :240] = p  # bottom-left quadrant
        frames.append(f)
    vid = tmp_path / "vr.mp4"
    write_video(vid, frames)

    err = process_video(str(vid), Params(overwrite=True, vr_mode=True, pair_batch=16),
                        lambda m: None)
    assert not err
    acts = load_funscript(str(tmp_path / "vr.funscript"))["actions"]
    # stroke period 10 frames @30fps -> keyframes every ~167ms
    gaps = np.diff([a["at"] for a in acts])
    assert 120 <= np.median(gaps) <= 240, f"median gap {np.median(gaps)}"
    assert max(a["pos"] for a in acts) - min(a["pos"] for a in acts) > 60


def test_vr_mode_ignores_motion_outside_crop(tmp_path):
    """Motion only in the right eye / top half must NOT produce a signal."""
    pattern = ref.make_synthetic_frames(30, h=240, w=240, period=8, seed=2)
    rng = np.random.default_rng(1)
    static = (rng.random((480, 480, 3)) * 255).astype(np.uint8)
    frames = []
    for p in pattern:
        f = static.copy()
        f[240:, 240:] = p  # bottom-RIGHT quadrant (other eye)
        frames.append(f)
    vid = tmp_path / "vr2.mp4"
    write_video(vid, frames)
    meta = iodec.probe(str(vid))
    got = FlowAnalyzer(PipelineConfig(pair_batch=16)).analyze_video_pairs(
        np.stack(list(iodec.sampled_frames(str(vid), meta, vr_mode=True))))
    # static crop -> no real motion signal (tolerance for mp4 codec ringing
    # bleeding across block boundaries; true motion is O(1))
    assert np.abs(got["dots"]).max() < 0.05


def test_pov_mode_fixed_center():
    frames = np.stack(ref.make_synthetic_frames(16, h=64, w=64, period=8, seed=4))
    got = FlowAnalyzer(PipelineConfig(pair_batch=8, pov_mode=True)).analyze_video_pairs(frames)
    # POV: center pinned at (w//2, h-1), smoothing is a no-op on constants
    assert (got["centers"][:, 0] == 32).all()
    assert (got["centers"][:, 1] == 63).all()
    # and matches the reference transcription in POV mode
    want = ref.analyze_pairs([ref.rgb_to_gray(f) for f in frames], pov_mode=True)
    np.testing.assert_allclose(got["dots"], want["dots"], atol=5e-3)


def test_pov_mode_end_to_end(tmp_path):
    frames = ref.make_synthetic_frames(40, h=120, w=160, period=10, seed=12)
    vid = tmp_path / "pov.mp4"
    write_video(vid, frames)
    err = process_video(str(vid), Params(overwrite=True, pov_mode=True, pair_batch=16),
                        lambda m: None)
    assert not err
    acts = load_funscript(str(tmp_path / "pov.funscript"))["actions"]
    assert len(acts) > 4
