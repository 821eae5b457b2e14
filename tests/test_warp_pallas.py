"""Mosaic band-warp kernel vs the XLA float32 gather path.

The Pallas warp (ops/pallas/warp.py) must be numerically exact against
ops.farneback._warp_bilinear(warp_dtype=float32) — the strict cv2-parity
path — for every in-bounds pixel, at any displacement magnitude (the band
decomposition is adaptive, not clamped). Runs in interpreter mode here;
the same kernel compiles natively on TPU.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from funscript_flow_tpu.ops.farneback import (
    FarnebackConfig,
    _warp_bilinear,
    farneback_flow,
    warp_inbounds,
)
from funscript_flow_tpu.ops.pallas.warp import (
    pack_warp_operand,
    warp_bilinear_pallas,
    warp_supported,
)


def _planes(rng, b, h, w, n=5):
    return tuple(
        jnp.asarray(rng.normal(size=(b, h, w)).astype(np.float32))
        for _ in range(n)
    )


@pytest.mark.parametrize("scale", [0.5, 5.0, 60.0])
@pytest.mark.parametrize("x_mode", ["piece", "roll"])
def test_matches_xla_f32_warp(rng, scale, x_mode):
    B, H, W = 2, 16, 256
    planes = _planes(rng, B, H, W)
    u = jnp.asarray((rng.normal(size=(B, H, W)) * scale).astype(np.float32))
    v = jnp.asarray((rng.normal(size=(B, H, W)) * scale).astype(np.float32))

    ref, inb = _warp_bilinear(planes, u, v, warp_dtype=jnp.float32)
    r, rx = pack_warp_operand(planes)
    out = warp_bilinear_pallas(r, rx, u, v, interpret=True, x_mode=x_mode)
    inb_np = np.asarray(inb)
    for p in range(5):
        np.testing.assert_allclose(
            np.asarray(out[:, p])[inb_np], np.asarray(ref[p])[inb_np],
            atol=1e-5,
        )


def test_inbounds_mask_matches_warp_bilinear(rng):
    B, H, W = 2, 16, 256
    planes = _planes(rng, B, H, W)
    u = jnp.asarray((rng.normal(size=(B, H, W)) * 30).astype(np.float32))
    v = jnp.asarray((rng.normal(size=(B, H, W)) * 30).astype(np.float32))
    _, inb = _warp_bilinear(planes, u, v, warp_dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(warp_inbounds(u, v)), np.asarray(inb)
    )


def test_warp_supported_gate():
    assert warp_supported(256, 256) and warp_supported(128, 128)
    # sub-tile widths fail the raw kernel gate; the farneback wrapper
    # edge-pads them to 128 lanes instead of falling back to XLA
    assert not warp_supported(64, 64)
    assert not warp_supported(100, 256)


def test_full_flow_pallas_vs_xla_f32(rng):
    """End-to-end Farnebäck with the Pallas warp at every level
    (64/32-px levels go through the width-padded route)."""
    import cv2

    base = rng.normal(size=(300, 300)).astype(np.float32)
    base = cv2.GaussianBlur(base, (0, 0), 4) * 40 + 128
    f0 = jnp.asarray(base[10:266, 10:266][None])
    f1 = jnp.asarray(base[13:269, 8:264][None])

    ref = np.asarray(
        farneback_flow(f0, f1, FarnebackConfig(warp_dtype="float32",
                                               warp_backend="xla"))
    )
    out = np.asarray(
        farneback_flow(f0, f1, FarnebackConfig(warp_backend="pallas"))
    )
    np.testing.assert_allclose(out, ref, atol=1e-4)


@pytest.mark.parametrize("dims", [(64, 64, 120, 120), (32, 32, 56, 56),
                                  (40, 48, 72, 88)])
def test_sample_abs_matches_packed_gather(dims, rng):
    """sample_abs_pallas (absolute-grid sampling, 1 plane, padded alignment)
    must match the packed XLA 4-corner gather used by the DIS dense patch
    sampler, including non-tile-aligned sources and output grids."""
    from funscript_flow_tpu.ops.pallas.warp import sample_abs_pallas
    from funscript_flow_tpu.models.dis import _bilinear_abs_packed

    h, w, Ho, Wo = dims
    B = 3
    img = jnp.asarray(rng.random((B, h, w)).astype(np.float32))
    fy = jnp.asarray(rng.uniform(0, h - 1, (B, Ho, Wo)).astype(np.float32))
    fx = jnp.asarray(rng.uniform(0, w - 1, (B, Ho, Wo)).astype(np.float32))
    a = np.asarray(_bilinear_abs_packed(img, fy, fx))
    b = np.asarray(sample_abs_pallas(img, fy, fx, interpret=True))
    np.testing.assert_allclose(a, b, atol=2e-5)
