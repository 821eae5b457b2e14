"""Batched image primitives (JAX) used by the optical-flow pipeline.

All functions take ``[B, H, W]`` float32 arrays (batch of grayscale frames)
and are built from static unrolled tap loops / cumulative sums — shapes and
kernel sizes are compile-time constants, so XLA fuses them into a handful of
elementwise passes. Border semantics follow the OpenCV functions they stand
in for (reference uses cv2.GaussianBlur / cv2.resize / box blur internals of
calcOpticalFlowFarneback, FunscriptFlow.pyw:878-879):

* Gaussian blur: BORDER_REFLECT_101 (cv2 default)
* polynomial-expansion separable correlation: replicate (index clamping)
* box blur: replicate
* resize: bilinear with half-pixel centers (cv2 INTER_LINEAR convention)
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "gaussian_kernel_cv",
    "gaussian_blur",
    "box_blur",
    "resize_bilinear",
    "sepconv",
    "cv_round",
]


def cv_round(x: float) -> int:
    """cvRound: round half to even (banker's rounding), like rint."""
    return int(np.rint(x))


def gaussian_kernel_cv(ksize: int, sigma: float) -> np.ndarray:
    """cv2.getGaussianKernel: if sigma <= 0, sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8.

    For ksize <= 7 and sigma <= 0 OpenCV substitutes fixed binomial kernels
    (getGaussianKernel's small_gaussian_tab) — reproduced here verbatim since
    the formula-derived kernels differ in the 2nd decimal.
    """
    if sigma <= 0 and ksize <= 7:
        tab = {
            1: [1.0],
            3: [0.25, 0.5, 0.25],
            5: [0.0625, 0.25, 0.375, 0.25, 0.0625],
            7: [0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125],
        }
        if ksize in tab:
            return np.asarray(tab[ksize], dtype=np.float32)
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    r = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    k = np.exp(-(r * r) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def _pad_1d(x: jax.Array, axis: int, lo: int, hi: int, mode: str) -> jax.Array:
    if mode == "reflect101":
        return jnp.pad(x, [(lo, hi) if a == axis else (0, 0) for a in range(x.ndim)], mode="reflect")
    if mode == "replicate":
        return jnp.pad(x, [(lo, hi) if a == axis else (0, 0) for a in range(x.ndim)], mode="edge")
    raise ValueError(mode)


def sepconv(x: jax.Array, taps_y, taps_x, border: str = "replicate") -> jax.Array:
    """Separable 2-D correlation over the trailing two axes.

    ``taps_y``/``taps_x`` are 1-D kernels (numpy or tuple). Implemented as
    statically unrolled shifted-slice sums over a padded array — XLA fuses
    this into one vector pass, no gather/conv layout traffic.
    """
    taps_y = np.asarray(taps_y, dtype=np.float32)
    taps_x = np.asarray(taps_x, dtype=np.float32)
    ry, rx = len(taps_y) // 2, len(taps_x) // 2
    h_ax, w_ax = x.ndim - 2, x.ndim - 1

    if len(taps_y) > 1:
        xp = _pad_1d(x, h_ax, ry, ry, border)
        acc = None
        H = x.shape[h_ax]
        for i, t in enumerate(taps_y):
            sl = jax.lax.slice_in_dim(xp, i, i + H, axis=h_ax)
            acc = sl * t if acc is None else acc + sl * t
        x = acc
    else:
        x = x * float(taps_y[0])

    if len(taps_x) > 1:
        xp = _pad_1d(x, w_ax, rx, rx, border)
        acc = None
        W = x.shape[w_ax]
        for i, t in enumerate(taps_x):
            sl = jax.lax.slice_in_dim(xp, i, i + W, axis=w_ax)
            acc = sl * t if acc is None else acc + sl * t
        x = acc
    else:
        x = x * float(taps_x[0])
    return x


def gaussian_blur(x: jax.Array, ksize: int, sigma: float) -> jax.Array:
    """cv2.GaussianBlur(ksize, sigma) with BORDER_REFLECT_101 semantics."""
    k = gaussian_kernel_cv(ksize, sigma)
    return sepconv(x, k, k, border="reflect101")


def box_blur(x: jax.Array, win: int) -> jax.Array:
    """Replicate-border mean filter of odd width ``win``.

    Matches the running-sum blur inside OpenCV's Farneback flow update
    (flags=0 path): every output is the mean of a full win x win replicated
    window. Implemented as an unrolled separable tap sum — on TPU a cumsum
    along the lane (last) axis serializes horribly, while ``win`` shifted
    adds stay fully vectorized on the VPU.
    """
    ones = np.ones(win, dtype=np.float32)
    return sepconv(x, ones, ones, border="replicate") * (1.0 / (win * win))


def resize_bilinear(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """cv2.resize INTER_LINEAR: half-pixel centers, edge clamp.

    src = (dst + 0.5) * (in/out) - 0.5; separable lerp with statically
    precomputed index/weight tables (shapes are compile-time constants).
    """
    in_h, in_w = x.shape[-2], x.shape[-1]

    def tables(n_in, n_out):
        d = np.arange(n_out, dtype=np.float64)
        s = (d + 0.5) * (n_in / n_out) - 0.5
        i0 = np.floor(s).astype(np.int64)
        w1 = (s - i0).astype(np.float32)
        # edge clamp: when both taps collapse to the same pixel the weight
        # cancels, so no weight adjustment is needed
        i0c = np.clip(i0, 0, n_in - 1)
        i1c = np.clip(i0 + 1, 0, n_in - 1)
        return i0c, i1c, jnp.asarray(w1)

    ry0, ry1, wy = tables(in_h, out_h)
    cx0, cx1, wx = tables(in_w, out_w)

    x = jnp.take(x, jnp.asarray(ry0), axis=-2) * (1.0 - wy[:, None]) + \
        jnp.take(x, jnp.asarray(ry1), axis=-2) * wy[:, None]
    x = jnp.take(x, jnp.asarray(cx0), axis=-1) * (1.0 - wx) + \
        jnp.take(x, jnp.asarray(cx1), axis=-1) * wx
    return x
