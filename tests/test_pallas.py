"""Pallas kernels vs their XLA references.

Runs in interpret mode on the CPU test platform; the compiled Mosaic path
was validated on the real chip (full Farnebäck with use_pallas=True matches
cv2.calcOpticalFlowFarneback to ~1e-5, same as the XLA path).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from funscript_flow_tpu.ops.farneback import (
    FarnebackConfig,
    farneback_flow_planes,
    poly_exp,
    solve_flow,
)
from funscript_flow_tpu.ops.pallas.polyexp import poly_exp_pallas
from funscript_flow_tpu.ops.pallas.flow_step import box_blur_solve_pallas


@pytest.mark.parametrize("shape", [(2, 64, 128), (1, 128, 256)])
def test_polyexp_kernel_matches_xla(rng, shape):
    img = jnp.asarray((rng.random(shape) * 255).astype(np.float32))
    want = poly_exp(img, 5, 1.2)
    got = poly_exp_pallas(img, 5, 1.2)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_polyexp_kernel_other_params(rng):
    img = jnp.asarray((rng.random((1, 64, 128)) * 255).astype(np.float32))
    want = poly_exp(img, 7, 1.5)
    got = poly_exp_pallas(img, 7, 1.5)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.parametrize("win", [15, 7])
def test_blur_solve_kernel_matches_xla(rng, win):
    M = tuple(jnp.asarray(rng.normal(0, 2, (2, 64, 128)).astype(np.float32))
              for _ in range(5))
    wu, wv = solve_flow(M, win)
    gu, gv = box_blur_solve_pallas(M, win)
    # random (unphysical) M makes the regularized 2x2 system near-singular at
    # some pixels, amplifying blur rounding differences; realistic data is
    # covered tightly by test_full_flow_pallas_path_matches_xla
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu), rtol=2e-2, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(wv), rtol=2e-2, atol=1e-3)


def test_full_flow_pallas_path_matches_xla(rng):
    """use_pallas=True end-to-end flow == XLA path (small pyramid levels
    fall back automatically)."""
    f0 = jnp.asarray((rng.random((1, 128, 128)) * 255).astype(np.float32))
    f1 = jnp.asarray((rng.random((1, 128, 128)) * 255).astype(np.float32))
    wu, wv = farneback_flow_planes(f0, f1, FarnebackConfig())
    gu, gv = farneback_flow_planes(f0, f1, FarnebackConfig(use_pallas=True))
    # blur-tap ordering differs (incremental rolls); with the bf16 warp
    # default the iterated difference reaches ~2e-4 px
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(wv), atol=1e-3)
