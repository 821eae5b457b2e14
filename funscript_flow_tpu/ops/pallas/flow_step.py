"""Fused Pallas kernel for the Farnebäck blur+solve stage.

Fuses the 5-plane win x win replicate box filter with the regularized 2x2
solve, VMEM-resident per batch element: the XLA version round-trips each
blurred plane (and each separable pass) through HBM; this kernel reads the
five constraint planes once and writes only the two flow planes.

The warp gather and M formation stay in XLA: per-element gathers have no
fast Mosaic form, and M formation is pure elementwise arithmetic XLA already
fuses into the gather's consumer. Keeping the kernel's input set small also
respects the v5e VMEM budget (a fully fused M+blur+solve kernel needs 13
input planes and overflows the ~16 MB scoped VMEM at 256x256).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["box_blur_solve_pallas"]

_PAD = 8  # sublane-aligned vertical halo


def _blur(m, scratch, rows: int, win: int):
    """win x win replicate-border mean filter of an [rows, W] value."""
    W = m.shape[-1]
    r = win // 2
    scratch[_PAD : _PAD + rows, :] = m
    scratch[0:_PAD, :] = jnp.broadcast_to(m[0:1, :], (_PAD, W))
    scratch[_PAD + rows : 2 * _PAD + rows, :] = jnp.broadcast_to(
        m[rows - 1 : rows, :], (_PAD, W)
    )
    acc = scratch[_PAD : _PAD + rows, :]
    for k in range(1, r + 1):
        acc = acc + scratch[_PAD - k : _PAD - k + rows, :] + \
            scratch[_PAD + k : _PAD + k + rows, :]

    # horizontal taps via *incremental* rolls: each step shifts the previous
    # shifted buffer by one, so only ~4 buffers are ever live (a chain of
    # independent roll-by-k temporaries overflows the Mosaic VMEM stack)
    col = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
    last = acc[:, W - 1 : W]
    first = acc[:, 0:1]
    out = acc
    r_cur = acc
    l_cur = acc
    for k in range(1, r + 1):
        r_cur = jnp.where(col >= W - k, last, pltpu.roll(r_cur, W - 1, axis=1))
        l_cur = jnp.where(col < k, first, pltpu.roll(l_cur, 1, axis=1))
        out = out + r_cur + l_cur
    return out * (1.0 / (win * win))


def _kernel(m0, m1, m2, m3, m4, u_out, v_out, scratch, *, rows: int, win: int):
    g11 = _blur(m0[0], scratch, rows, win)
    g12 = _blur(m1[0], scratch, rows, win)
    g22 = _blur(m2[0], scratch, rows, win)
    h1 = _blur(m3[0], scratch, rows, win)
    h2 = _blur(m4[0], scratch, rows, win)
    idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
    u_out[0] = (g22 * h1 - g12 * h2) * idet
    v_out[0] = (g11 * h2 - g12 * h1) * idet


@functools.partial(jax.jit, static_argnames=("winsize", "interpret"))
def box_blur_solve_pallas(M, winsize: int = 15, interpret: bool | None = None):
    """M: 5-tuple of [B, H, W] float32 constraint planes -> (u, v) planes."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"  # Mosaic needs a TPU
    B, H, W = M[0].shape
    spec = pl.BlockSpec((1, H, W), lambda b: (b, 0, 0))
    u, v = pl.pallas_call(
        functools.partial(_kernel, rows=H, win=winsize),
        grid=(B,),
        out_shape=[jax.ShapeDtypeStruct((B, H, W), jnp.float32)] * 2,
        in_specs=[spec] * 5,
        out_specs=[spec] * 2,
        scratch_shapes=[pltpu.VMEM((H + 2 * _PAD, W), jnp.float32)],
        interpret=interpret,
    )(*M)
    return u, v
