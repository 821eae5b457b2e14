"""Direct unit tests for ops/image.py primitives vs their OpenCV equivalents
(previously covered only transitively through the Farnebäck end-to-end match)."""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from funscript_flow_tpu.io.decode import preprocess_frame
from funscript_flow_tpu.ops import image as im


@pytest.mark.parametrize("ks,sigma", [(3, 0.0), (5, 0.0), (7, 0.0), (7, 1.2),
                                      (19, 3.5), (9, 1.5), (17, 3.0)])
def test_gaussian_blur_matches_cv2(rng, ks, sigma):
    x = (rng.random((37, 53)) * 255).astype(np.float32)
    want = cv2.GaussianBlur(x, (ks, ks), sigma, sigmaY=sigma)
    got = np.asarray(im.gaussian_blur(jnp.asarray(x[None]), ks, sigma))[0]
    np.testing.assert_allclose(got, want, atol=1e-3)


@pytest.mark.parametrize("oh,ow", [(18, 26), (74, 106), (32, 32), (19, 27), (256, 256)])
def test_resize_matches_cv2_inter_linear(rng, oh, ow):
    x = (rng.random((37, 53)) * 255).astype(np.float32)
    want = cv2.resize(x, (ow, oh), interpolation=cv2.INTER_LINEAR)
    got = np.asarray(im.resize_bilinear(jnp.asarray(x[None]), oh, ow))[0]
    np.testing.assert_allclose(got, want, atol=1e-3)


@pytest.mark.parametrize("win", [3, 5, 15])
def test_box_blur_matches_cv2_replicate(rng, win):
    x = (rng.random((40, 56)) * 255).astype(np.float32)
    want = cv2.blur(x, (win, win), borderType=cv2.BORDER_REPLICATE)
    got = np.asarray(im.box_blur(jnp.asarray(x[None]), win))[0]
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_gaussian_kernel_matches_cv2():
    for ks, sigma in [(3, 0.0), (5, 0.0), (7, 0.0), (19, 3.5), (11, 1.2)]:
        want = cv2.getGaussianKernel(ks, sigma, cv2.CV_32F).ravel()
        got = im.gaussian_kernel_cv(ks, sigma)
        np.testing.assert_allclose(got, want, atol=1e-7)


def test_sepconv_replicate_border(rng):
    x = (rng.random((20, 24))).astype(np.float32)
    k = np.array([0.25, 0.5, 0.25], np.float32)
    want = cv2.sepFilter2D(x, -1, k, k, borderType=cv2.BORDER_REPLICATE)
    got = np.asarray(im.sepconv(jnp.asarray(x[None]), k, k, border="replicate"))[0]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_vr_preprocess_high_res():
    """BASELINE config 4: VR equirect 5.7K-class frames crop/resize correctly."""
    h, w = 2880, 5760
    f = np.zeros((h, w, 3), np.uint8)
    f[h // 2 :, : w // 2] = 200  # bottom half of left eye
    out = preprocess_frame(f, vr_mode=True)
    assert out.shape == (256, 256, 3)
    assert out.mean() > 190  # crop landed on the bright region


def test_preprocess_4k_2d():
    """BASELINE config 5-adjacent: 4K 2D frames downscale to the analysis grid."""
    f = np.full((2160, 3840, 3), 57, np.uint8)
    out = preprocess_frame(f, vr_mode=False)
    assert out.shape == (256, 256, 3)
    assert np.abs(out.astype(int) - 57).max() <= 1
