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
def test_matches_xla_f32_warp(rng, scale):
    B, H, W = 2, 16, 256
    planes = _planes(rng, B, H, W)
    u = jnp.asarray((rng.normal(size=(B, H, W)) * scale).astype(np.float32))
    v = jnp.asarray((rng.normal(size=(B, H, W)) * scale).astype(np.float32))

    ref, inb = _warp_bilinear(planes, u, v, warp_dtype=jnp.float32)
    r, rx = pack_warp_operand(planes)
    out = warp_bilinear_pallas(r, rx, u, v, interpret=True)
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
    assert not warp_supported(64, 64)     # sub-tile levels use the XLA path
    assert not warp_supported(100, 256)


def test_full_flow_pallas_vs_xla_f32(rng):
    """End-to-end Farnebäck with the Pallas warp at the 256/128 levels."""
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
