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

pytestmark = pytest.mark.slow  # golden/e2e: minutes, not seconds


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


@pytest.mark.parametrize("shift", [(2.5, -1.5), (4.5, 3.0), (-8.0, 6.0)])
def test_dis_comparable_to_cv2_dis(shift):
    """Same input: our FAST-preset EPE within ~1.5x of cv2 DIS FAST's.

    (Round 1 ran without variational refinement and allowed 3x; the
    refinement brought the measured ratios to 1.1-1.6x.)
    """
    rng = np.random.default_rng(9)
    f0, f1 = make_pair(rng, 256, 256, shift)
    dis = cv2.DISOpticalFlow_create(cv2.DISOPTICAL_FLOW_PRESET_FAST)
    want = dis.calc(f0, f1, None)
    u, v = dis_flow_planes(jnp.asarray(f0[None]), jnp.asarray(f1[None]),
                           DISConfig.preset("fast"))
    got = np.stack([np.asarray(u)[0], np.asarray(v)[0]], -1)
    def epe(fl):
        return np.hypot(fl[32:-32, 32:-32, 0] - shift[0], fl[32:-32, 32:-32, 1] - shift[1]).mean()
    assert epe(got) < max(1.7 * epe(want), 0.3), (epe(got), epe(want))


def test_variational_refinement_improves_noisy_flow():
    """Brox refinement must shrink the EPE of a noise-perturbed true flow,
    at least as much as cv2.VariationalRefinement does on the same input."""
    from funscript_flow_tpu.models.dis import variational_refinement

    rng = np.random.default_rng(0)
    h = w = 64
    base = cv2.GaussianBlur(
        rng.normal(size=(h + 20, w + 20)).astype(np.float32), (0, 0), 3
    ) * 60 + 128
    I0 = base[10:10 + h, 10:10 + w]
    mx, my = np.meshgrid(np.arange(w, dtype=np.float32) + 10 + 1.3,
                         np.arange(h, dtype=np.float32) + 10 - 0.8)
    I1 = cv2.remap(base, mx, my, cv2.INTER_LINEAR)
    tu, tv = -1.3, 0.8
    u0 = np.full((h, w), tu, np.float32) + rng.normal(size=(h, w)).astype(np.float32) * 0.4
    v0 = np.full((h, w), tv, np.float32) + rng.normal(size=(h, w)).astype(np.float32) * 0.4

    def epe(u, v):
        return float(np.mean(np.hypot(u - tu, v - tv)))

    uu, vv = variational_refinement(
        jnp.asarray(I0[None]), jnp.asarray(I1[None]),
        jnp.asarray(u0[None]), jnp.asarray(v0[None]), DISConfig()
    )
    ours = epe(np.asarray(uu[0]), np.asarray(vv[0]))

    flow = np.stack([u0, v0], axis=-1).astype(np.float32)
    cv2.VariationalRefinement_create().calc(
        I0.astype(np.uint8), I1.astype(np.uint8), flow
    )
    theirs = epe(flow[..., 0], flow[..., 1])
    assert ours < epe(u0, v0) * 0.5
    assert ours < max(1.5 * theirs, 0.1), (ours, theirs)


def test_dis_presets_match_cv2_knobs():
    """Preset table mirrors cv2.DISOpticalFlow getters."""
    for name, cv_preset in [("ultrafast", cv2.DISOPTICAL_FLOW_PRESET_ULTRAFAST),
                            ("fast", cv2.DISOPTICAL_FLOW_PRESET_FAST),
                            ("medium", cv2.DISOPTICAL_FLOW_PRESET_MEDIUM)]:
        ours = DISConfig.preset(name)
        d = cv2.DISOpticalFlow_create(cv_preset)
        assert ours.finest_scale == d.getFinestScale()
        assert ours.patch_size == d.getPatchSize()
        assert ours.patch_stride == d.getPatchStride()
        assert ours.gd_iters == d.getGradientDescentIterations()
        assert ours.var_iters == d.getVariationalRefinementIterations()


@pytest.mark.parametrize("dims", [(64, 64, 15, 15), (32, 32, 7, 7), (40, 48, 9, 11)])
def test_dense_patch_sampler_matches_window_gather(dims):
    """_sample_patches_dense (one dense packed gather — the TPU-fast layout)
    must agree with the per-patch window gather to f32 rounding, including
    far out-of-range offsets that exercise the corner clamping."""
    from funscript_flow_tpu.models.dis import _sample_patches, _sample_patches_dense

    h, w, ny, nx = dims
    st, ps, B = 4, 8, 5
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((B, h, w)), jnp.float32)
    py = jnp.asarray((np.arange(ny) * st)[:, None] * np.ones((1, nx)), jnp.float32)
    px = jnp.asarray(np.ones((ny, 1)) * (np.arange(nx) * st)[None, :], jnp.float32)
    uy = jnp.asarray(rng.uniform(-h, h, (B, ny, nx)), jnp.float32)
    ux = jnp.asarray(rng.uniform(-w, w, (B, ny, nx)), jnp.float32)
    a = np.asarray(_sample_patches(img, py, px, uy, ux, ps))
    b = np.asarray(_sample_patches_dense(img, py, px, uy, ux, ps))
    np.testing.assert_allclose(a, b, atol=5e-5)


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
