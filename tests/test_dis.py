"""DIS backend: statistical validation vs cv2.DISOpticalFlow + pipeline wiring.

Our DIS is a from-scratch TPU implementation of the same algorithm family
(see models/dis.py docstring for documented deviations), so validation is
statistical — endpoint error on known synthetic motion — not bit-exact.
"""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

import reference_cv as ref
from funscript_flow_tpu.models.dis import DISConfig, dis_flow_planes
from funscript_flow_tpu.models.pipeline import PipelineConfig, FlowAnalyzer


def make_pair(rng, h, w, shift, sigma=4.0):
    base = cv2.GaussianBlur(rng.random((h * 2, w * 2)).astype(np.float32) * 255, (0, 0), sigma)
    f0 = base[h // 2 : h // 2 + h, w // 2 : w // 2 + w]
    M = np.float32([[1, 0, shift[0]], [0, 1, shift[1]]])
    f1 = cv2.warpAffine(base, M, (w * 2, h * 2))[h // 2 : h // 2 + h, w // 2 : w // 2 + w]
    return f0.astype(np.uint8), f1.astype(np.uint8)


@pytest.mark.parametrize("shift", [(3.0, 0.0), (0.0, -2.5), (4.5, 3.0), (-8.0, 6.0)])
def test_dis_recovers_translation(shift):
    rng = np.random.default_rng(7)
    f0, f1 = make_pair(rng, 256, 256, shift)
    u, v = dis_flow_planes(jnp.asarray(f0[None]), jnp.asarray(f1[None]))
    u, v = np.asarray(u)[0], np.asarray(v)[0]
    # interior only (borders poorly constrained, as in cv2)
    ui, vi = u[32:-32, 32:-32], v[32:-32, 32:-32]
    epe = np.hypot(ui - shift[0], vi - shift[1]).mean()
    assert epe < 1.0, f"mean EPE {epe} for shift {shift}"


def test_dis_comparable_to_cv2_dis():
    """On the same input, our EPE should be within 3x of cv2 DIS FAST's."""
    rng = np.random.default_rng(9)
    shift = (2.5, -1.5)
    f0, f1 = make_pair(rng, 256, 256, shift)
    dis = cv2.DISOpticalFlow_create(cv2.DISOPTICAL_FLOW_PRESET_FAST)
    want = dis.calc(f0, f1, None)
    u, v = dis_flow_planes(jnp.asarray(f0[None]), jnp.asarray(f1[None]))
    got = np.stack([np.asarray(u)[0], np.asarray(v)[0]], -1)
    def epe(fl):
        return np.hypot(fl[32:-32, 32:-32, 0] - shift[0], fl[32:-32, 32:-32, 1] - shift[1]).mean()
    assert epe(got) < max(3 * epe(want), 0.8), (epe(got), epe(want))


def test_dis_zero_motion_is_zeroish():
    rng = np.random.default_rng(3)
    f0, _ = make_pair(rng, 128, 128, (0, 0))
    u, v = dis_flow_planes(jnp.asarray(f0[None]), jnp.asarray(f0[None]))
    assert np.abs(np.asarray(u)).max() < 0.2
    assert np.abs(np.asarray(v)).max() < 0.2


def test_pipeline_with_dis_backend_recovers_stroke():
    """End-to-end with flow_algorithm='dis': the oscillation must survive."""
    frames = np.stack(ref.make_synthetic_frames(40, h=128, w=128, period=10, seed=5))
    an = FlowAnalyzer(PipelineConfig(pair_batch=16, flow_algorithm="dis"))
    got = an.analyze_video_pairs(frames)
    dots = got["dots"]
    # dots should oscillate with period ~10 pairs: strong autocorrelation at lag 10
    d = dots - dots.mean()
    ac = np.correlate(d, d, "full")[len(d) - 1 :]
    assert ac[10] > 0.3 * ac[0]
    # expansion phase positive, contraction negative
    assert dots.max() > 0 > dots.min()
