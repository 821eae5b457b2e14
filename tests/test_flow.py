"""Farnebäck flow + per-pair reductions vs OpenCV / the reference transcription."""

import cv2
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import reference_cv as ref
from funscript_flow_tpu.ops.farneback import FarnebackConfig, farneback_flow
from funscript_flow_tpu.ops import reductions as red
from funscript_flow_tpu.models.pipeline import (
    PipelineConfig,
    FlowAnalyzer,
    flow_chunk_program,
    rgb_to_gray_cv,
)

pytestmark = pytest.mark.slow  # golden/e2e: minutes, not seconds


def make_pair(rng, h, w, shift=(1.5, -0.8), sigma=3.0):
    base = cv2.GaussianBlur(rng.random((h * 2, w * 2)).astype(np.float32) * 255, (0, 0), sigma)
    f0 = base[h // 2 : h // 2 + h, w // 2 : w // 2 + w]
    M = np.float32([[1, 0, shift[0]], [0, 1, shift[1]]])
    moved = cv2.warpAffine(base, M, (w * 2, h * 2))
    f1 = moved[h // 2 : h // 2 + h, w // 2 : w // 2 + w]
    return f0.astype(np.uint8), f1.astype(np.uint8)


@pytest.mark.parametrize(
    "h,w,shift",
    [(48, 48, (1.5, -0.8)), (256, 256, (2.5, -1.2)), (256, 256, (8.0, 5.0)), (100, 150, (1.0, 2.0))],
)
def test_farneback_matches_cv2(h, w, shift):
    rng = np.random.default_rng(42)
    f0, f1 = make_pair(rng, h, w, shift)
    want = cv2.calcOpticalFlowFarneback(f0, f1, None, 0.5, 3, 15, 3, 5, 1.2, 0)
    # default config: bf16 warp-gather operand (~1e-3 px vs cv2 for small
    # displacements, up to ~2e-2 px for large ones — both orders of
    # magnitude below anything visible in the 0-100 funscript output)
    got = np.asarray(farneback_flow(jnp.asarray(f0[None]), jnp.asarray(f1[None])))[0]
    assert np.abs(got - want).max() < 5e-2
    # strict-parity mode: f32 warp, ~1e-5 px
    strict = FarnebackConfig(warp_dtype="float32")
    got32 = np.asarray(
        farneback_flow(jnp.asarray(f0[None]), jnp.asarray(f1[None]), strict)
    )[0]
    assert np.abs(got32 - want).max() < 1e-3


def test_farneback_batched_equals_percall():
    rng = np.random.default_rng(3)
    pairs = [make_pair(rng, 64, 64, (dx, dy)) for dx, dy in [(1, 0), (-2, 1), (0.5, 3)]]
    f0 = jnp.asarray(np.stack([p[0] for p in pairs]))
    f1 = jnp.asarray(np.stack([p[1] for p in pairs]))
    batched = np.asarray(farneback_flow(f0, f1))
    for i, (a, b) in enumerate(pairs):
        single = np.asarray(farneback_flow(jnp.asarray(a[None]), jnp.asarray(b[None])))[0]
        np.testing.assert_allclose(batched[i], single, atol=1e-5)


def test_divergence_center_matches_reference(rng):
    flow = rng.normal(0, 2, (3, 32, 40, 2)).astype(np.float32)
    centers, vals = red.max_divergence_center(jnp.asarray(flow[..., 0]), jnp.asarray(flow[..., 1]))
    for i in range(3):
        x, y, v = ref.max_divergence(flow[i])
        assert (centers[i, 0], centers[i, 1]) == (x, y)
        np.testing.assert_allclose(vals[i], v, rtol=1e-5)


def test_mean_magnitude_matches_cartToPolar(rng):
    flow = rng.normal(0, 3, (2, 64, 64, 2)).astype(np.float32)
    got = np.asarray(red.mean_flow_magnitude(jnp.asarray(flow[..., 0]), jnp.asarray(flow[..., 1])))
    for i in range(2):
        mag, _ = cv2.cartToPolar(flow[i, ..., 0], flow[i, ..., 1])
        np.testing.assert_allclose(got[i], mag.mean(), rtol=1e-5)


def test_radial_motion_matches_reference(rng):
    flow = rng.normal(0, 2, (4, 48, 56, 2)).astype(np.float32)
    centers = np.array([[28.0, 24.0], [10.5, 40.2], [0.0, 0.0], [55.0, 47.0]], np.float32)
    cuts = np.array([False, False, True, False])
    got = np.asarray(
        red.radial_motion_weighted(jnp.asarray(flow[..., 0]), jnp.asarray(flow[..., 1]), jnp.asarray(centers), jnp.asarray(cuts))
    )
    for i in range(4):
        want = ref.radial_motion_weighted(flow[i], centers[i], cuts[i])
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-6)
    # POV mode
    got_pov = np.asarray(
        red.radial_motion_weighted(jnp.asarray(flow[..., 0]), jnp.asarray(flow[..., 1]), jnp.asarray(centers), jnp.asarray(cuts), True)
    )
    for i in range(4):
        want = ref.radial_motion_weighted(flow[i], centers[i], cuts[i], True)
        np.testing.assert_allclose(got_pov[i], want, rtol=1e-4, atol=1e-6)


def test_smooth_centers_matches_reference(rng):
    n = 20
    centers = rng.normal(128, 30, (n, 2)).astype(np.float32)
    got = np.asarray(red.smooth_centers(jnp.asarray(centers), jnp.int32(n)))
    for j in range(n):
        cl = [centers[j]]
        for i in range(1, 7):
            if j - i >= 0:
                cl.append(centers[j - i])
            if j + i < n:
                cl.append(centers[j + i])
        np.testing.assert_allclose(got[j], np.mean(cl, axis=0), rtol=1e-5)


def test_gray_matches_cv2(rng):
    rgb = rng.integers(0, 256, (2, 16, 24, 3), dtype=np.uint8)
    got = np.asarray(rgb_to_gray_cv(jnp.asarray(rgb)))
    for i in range(2):
        want = cv2.cvtColor(rgb[i], cv2.COLOR_RGB2GRAY)
        np.testing.assert_array_equal(got[i].astype(np.uint8), want)


def test_pipeline_matches_reference_transcription():
    """End-to-end device program vs the cv2 transcription on synthetic video."""
    frames = ref.make_synthetic_frames(24, h=64, w=64, period=12, seed=5)
    gray = [ref.rgb_to_gray(f) for f in frames]
    want = ref.analyze_pairs(gray)

    an = FlowAnalyzer(PipelineConfig(pair_batch=8))
    got = an.analyze_video_pairs(np.stack(frames))

    assert got["dots"].shape == (23,)
    np.testing.assert_array_equal(got["cuts"], want["cuts"])
    # centers: argmax-of-divergence is winner-take-all; on synthetic zooms the
    # max is sharp, so smoothed centers should agree closely
    np.testing.assert_allclose(got["centers"], want["centers"], atol=1.0)
    np.testing.assert_allclose(got["dots"], want["dots"], atol=5e-3)
    np.testing.assert_allclose(got["mean_mag"], want["mean_mag"], atol=1e-3)


def test_pipeline_batchsize_invariance():
    """Results must not depend on the device micro-batch size (halo correct)."""
    frames = np.stack(ref.make_synthetic_frames(20, h=64, w=64, period=10, seed=7))
    outs = []
    for bs in (4, 7, 19):
        an = FlowAnalyzer(PipelineConfig(pair_batch=bs))
        outs.append(an.analyze_video_pairs(frames))
    for k in ("dots", "centers", "mean_mag"):
        np.testing.assert_allclose(outs[0][k], outs[1][k], atol=1e-5)
        np.testing.assert_allclose(outs[0][k], outs[2][k], atol=1e-5)


def test_pipeline_cut_detection():
    # texture swap gives mean|flow| ~1.4 vs ~0.2-0.65 for real motion on this
    # clip (the default threshold 7 is tuned for 256x256 real video); use a
    # custom cut_threshold — the reference's config-only knob (SURVEY §5)
    frames = np.stack(ref.make_synthetic_frames(12, h=64, w=64, period=8, seed=3, cuts=(6,)))
    an = FlowAnalyzer(PipelineConfig(pair_batch=16, cut_threshold=1.0))
    got = an.analyze_video_pairs(frames)
    want = ref.analyze_pairs([ref.rgb_to_gray(f) for f in frames], cut_threshold=1.0)
    np.testing.assert_array_equal(got["cuts"], want["cuts"])
    assert got["cuts"][5]          # pair (5, 6) spans the texture swap
    assert not got["cuts"][4] and not got["cuts"][6]
    assert got["dots"][5] == 0.0   # cut pairs contribute 0 motion
