"""Fused Pallas kernel for Farnebäck polynomial expansion.

One pass over the image computes all five coefficient planes: the XLA
version (ops.farneback.poly_exp) issues six separable correlations that each
re-read the image tile from HBM; this kernel DMAs each row-tile (plus a
poly_n halo) into VMEM once, runs the vertical taps into three accumulators,
applies the horizontal taps with ``pltpu.roll`` + replicate-edge fixups
(keeping the lane dimension exactly W — no width padding, no layout churn),
and writes the five planes.

Numerics identical to ops.farneback.poly_exp (same applicability kernels and
dual-basis constants; verified to ~1e-5 in tests/test_pallas.py). Enabled
via PipelineConfig(use_pallas=True) / FarnebackConfig.use_pallas.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..farneback import _poly_exp_tables

__all__ = ["poly_exp_pallas"]


def _shift_cols(x: jax.Array, k: int, last_col: jax.Array, first_col: jax.Array):
    """x shifted k columns (k>0: sample x[., j+k]) with replicate edges."""
    W = x.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    if k > 0:
        r = pltpu.roll(x, W - k, axis=x.ndim - 1)  # left shift by k
        return jnp.where(col >= W - k, last_col, r)
    if k < 0:
        r = pltpu.roll(x, -k, axis=x.ndim - 1)     # right shift by |k|
        return jnp.where(col < -k, first_col, r)
    return x


def _kernel(img_hbm, out0, out1, out2, out3, out4, scratch, sem,
            *, taps, ig, rows: int, n: int):
    b = pl.program_id(0)
    g, xg, xxg = taps
    ig11, ig03, ig33, ig55 = ig

    dma = pltpu.make_async_copy(img_hbm.at[b], scratch, sem)
    dma.start()
    dma.wait()

    # vertical taps: three accumulators over the full halo'd image
    pad = 8  # halo padded to the sublane tile so DMA shapes stay aligned
    t0 = scratch[pad : pad + rows, :] * g[n]
    t1 = jnp.zeros_like(t0)
    t2 = jnp.zeros_like(t0)
    for k in range(1, n + 1):
        up = scratch[pad - k : pad - k + rows, :]
        dn = scratch[pad + k : pad + k + rows, :]
        t0 = t0 + g[n + k] * (up + dn)
        t1 = t1 + xg[n + k] * (dn - up)
        t2 = t2 + xxg[n + k] * (up + dn)

    # horizontal taps via rolls with replicate-edge fixups
    def hconv(t, kern, odd):
        last = t[:, -1:]
        first = t[:, :1]
        acc = t * kern[n]
        for k in range(1, n + 1):
            right = _shift_cols(t, k, last, first)
            left = _shift_cols(t, -k, last, first)
            if odd:
                acc = acc + kern[n + k] * (right - left)
            else:
                acc = acc + kern[n + k] * (right + left)
        return acc

    bc = hconv(t0, g, False)
    bx = hconv(t0, xg, True)
    bxx = hconv(t0, xxg, False)
    by = hconv(t1, g, False)
    bxy = hconv(t1, xg, True)
    byy = hconv(t2, g, False)

    out0[0] = bx * ig11
    out1[0] = by * ig11
    out2[0] = bc * ig03 + bxx * ig33
    out3[0] = bc * ig03 + byy * ig33
    out4[0] = bxy * ig55


@functools.partial(jax.jit, static_argnames=("poly_n", "poly_sigma", "interpret"))
def poly_exp_pallas(img: jax.Array, poly_n: int = 5, poly_sigma: float = 1.2,
                    interpret: bool | None = None):
    """img [B, H, W] float32 -> (bx, by, Axx, Ayy, Axy2) planes [B, H, W].

    Grid over the batch axis; each step holds one halo-padded image in VMEM
    (analysis frames are 256x256 -> ~270 KB, far under the ~16 MB budget),
    so every slice is static and aligned.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"  # Mosaic needs a TPU
    B, H, W = img.shape
    n = poly_n
    g, xg, xxg, ig = _poly_exp_tables(poly_n, poly_sigma)
    # taps as static python floats (tiny, unrolled) — kernels cannot capture
    # traced constants
    taps = (tuple(float(x) for x in g),
            tuple(float(x) for x in xg),
            tuple(float(x) for x in xxg))

    # replicate-pad by 8 rows per side (>= n, keeps DMA shapes 8-aligned)
    padded = jnp.concatenate(
        [jnp.repeat(img[:, :1], 8, axis=1), img, jnp.repeat(img[:, -1:], 8, axis=1)],
        axis=1,
    )

    out_shape = [jax.ShapeDtypeStruct((B, H, W), jnp.float32)] * 5
    out_spec = pl.BlockSpec((1, H, W), lambda b: (b, 0, 0))
    outs = pl.pallas_call(
        functools.partial(_kernel, taps=taps, ig=ig, rows=H, n=n),
        grid=(B,),
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[out_spec] * 5,
        scratch_shapes=[
            pltpu.VMEM((H + 16, W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(padded)
    return tuple(outs)
