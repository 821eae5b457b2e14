"""Mosaic bilinear-warp kernel — the Farnebäck hot spot.

The reference delegates warping to OpenCV's C++ interior loop
(cv2.calcOpticalFlowFarneback, FunscriptFlow.pyw:878-879); our XLA port
(ops.farneback._warp_bilinear) expresses it as one big gather, which XLA:TPU
executes at ~70M indices/s (scalar-core driven) — ~70% of device time in
round 1.

This kernel replaces that gather with VPU-speed `tpu.dynamic_gather`
shuffles. Mosaic only supports dynamic_gather on a single (8, 128) tile, so
the 2-D warp is decomposed exactly:

* output processed in (8, 128) tiles (grid = (B, H/8, W/128));
* **x axis**: lane gathers against each 128-wide source piece of the row
  band, combined with disjoint piece masks (arbitrary horizontal
  displacement);
* **y axis**: an adaptive ``fori_loop`` over the tile's integer displacement
  band ``dy ∈ [min ⌊v⌋, max ⌊v⌋ + 1]`` — each step reads the 8-row source
  group at that offset and mask-accumulates the top/bottom bilinear corners.
  Flow is smooth, so the trip count is typically 2-4; it grows only where
  the flow field actually varies within a tile. No displacement clamping:
  the decomposition is exact for any flow magnitude.

Mosaic requires dynamic sublane offsets to be 8-aligned, so each band step
loads an aligned 16-row group and rotates it into place with a dynamic
sublane roll (``tpu.dynamic_rotate``).

Numerics match ops.farneback._warp_bilinear with warp_dtype=float32 (the
strict cv2-parity path) for all in-bounds pixels; out-of-bounds lanes are
discarded by the caller's ``inb`` mask exactly as in the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["warp_supported", "pack_warp_operand", "warp_bilinear_pallas",
           "sample_abs_pallas"]

# rows of edge padding above/below: covers the y+1 corner at y = H-1 AND the
# 16-row aligned group read at the largest band offset (base+16 <= H+2*PAD)
_PAD = 16
_N_PLANES = 5


def warp_supported(h: int, w: int) -> bool:
    """Tile-alignment constraint of the Mosaic gather decomposition."""
    return h % 8 == 0 and w % 128 == 0


def pack_warp_operand(planes):
    """[B,H,W] plane tuple -> (R, Rx) stacked [B,P,H+2*PAD,W] operands.

    R is edge-padded in y; Rx is additionally shifted by one column with the
    last column replicated (so a lane gather at x0 fetches the x0+1 corner,
    clamped like the XLA path). Built once per pyramid level and reused by
    every warp iteration at that level.
    """
    r = jnp.stack(planes, axis=1)  # [B, 5, H, W]
    rx = jnp.concatenate([r[..., 1:], r[..., -1:]], axis=-1)
    pad = ((0, 0), (0, 0), (_PAD, _PAD), (0, 0))
    return jnp.pad(r, pad, mode="edge"), jnp.pad(rx, pad, mode="edge")


def _kernel(r_ref, rx_ref, u_ref, v_ref, out_ref, *, h: int, w: int,
            n_planes: int, x_mode: str):
    """One (8, 128) output tile. ``h``/``w`` are the SOURCE plane dims (the
    clamp/piece bounds); the output grid may be a different shape — (u, v)
    are displacements from the output pixel's own (row, col), so absolute
    sampling grids just pass ``coord - iota``.

    ``x_mode`` picks the lane-gather decomposition:

    * ``"piece"``: one gather per 128-wide source piece, mask-combined —
      w//128 gathers per plane per band step, unconditionally.
    * ``"roll"``: rotate the row band left by the tile's min source column
      (``tpu.dynamic_rotate``), so every needed column lands within the
      first ``spread+1`` lanes; one gather almost always suffices (flow is
      smooth — a tile's x-displacement spread rarely exceeds 127). Further
      pieces run under ``lax.cond`` and are SKIPPED at run time unless the
      spread actually crosses their boundary.

    MEASURED (round 3, v5e, 240-pair Farnebäck batch): "piece" 159.4 ms,
    "roll" 530.9 ms — the per-band-step dynamic lane rotations plus the
    scalar ``cond`` cost ~3x more than the one gather they save, so "piece"
    stays the default. "roll" is kept (bitwise-identical on TPU, tested)
    as the documented negative result.
    """
    i = pl.program_id(1)
    j = pl.program_id(2)

    ys = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) + i * 8
    xs = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) + j * 128
    fx = xs.astype(jnp.float32) + u_ref[0]
    fy = ys.astype(jnp.float32) + v_ref[0]
    x1 = jnp.floor(fx)
    y1 = jnp.floor(fy)
    wx = fx - x1
    wy = fy - y1
    x0c = jnp.clip(x1.astype(jnp.int32), 0, w - 1)
    y0c = jnp.clip(y1.astype(jnp.int32), 0, h - 1)

    dy_top = y0c - ys                      # integer band offset per element
    dy_lo = jnp.min(dy_top)
    trip = jnp.max(dy_top) - dy_lo + 2     # +1 for the bottom corner row

    n_pieces = w // 128
    zero = jnp.zeros((8, 128), jnp.float32)

    if x_mode == "roll" and n_pieces > 1:
        x_lo = jnp.min(x0c)                # rotate source so x_lo -> lane 0
        spread = jnp.max(x0c) - x_lo
        rel = x0c - x_lo                   # needed column, post-rotation
        piece_idx = [jnp.clip(rel - p * 128, 0, 127) for p in range(n_pieces)]
        piece_mask = [None if n_pieces == 1 else
                      (rel >= p * 128) & (rel < p * 128 + 128)
                      for p in range(n_pieces)]
    else:
        x_mode = "piece"
        x_lo = None
        piece_idx = [jnp.clip(x0c - p * 128, 0, 127) for p in range(n_pieces)]
        piece_mask = [(x0c >= p * 128) & (x0c < p * 128 + 128)
                      if n_pieces > 1 else None for p in range(n_pieces)]

    def gather_pieces(rows, rowsx):
        """(value, x+1-value) bilinear-x combine for one 8-row source band."""
        if x_mode == "roll":
            rows = pltpu.roll(rows, -x_lo, axis=1)
            rowsx = pltpu.roll(rowsx, -x_lo, axis=1)

        def piece_val(piece):
            op = rows[:, piece * 128:(piece + 1) * 128]
            opx = rowsx[:, piece * 128:(piece + 1) * 128]
            g = jnp.take_along_axis(op, piece_idx[piece], axis=1)
            gx = jnp.take_along_axis(opx, piece_idx[piece], axis=1)
            val = g * (1.0 - wx) + gx * wx
            if piece_mask[piece] is None:
                return val
            return jnp.where(piece_mask[piece], val, 0.0)

        vx = piece_val(0)
        for piece in range(1, n_pieces):
            if x_mode == "roll":
                # almost-always-skipped branch: only tiles whose x spread
                # crosses piece*128 pay for this gather
                vx = jax.lax.cond(
                    spread >= piece * 128,
                    lambda vx=vx, piece=piece: vx + piece_val(piece),
                    lambda vx=vx: vx,
                )
            else:
                vx = vx + piece_val(piece)
        return vx

    def body(k, acc):
        acc_top, acc_bot = acc
        dy = dy_lo + k
        start = i * 8 + dy + _PAD          # row offset into the padded plane
        base = pl.multiple_of((start // 8) * 8, 8)
        off = start - base                 # 0..7 sublane rotation
        m_top = dy_top == dy
        m_bot = dy_top + 1 == dy
        new_top = []
        new_bot = []
        for p in range(n_planes):
            rows = pltpu.roll(r_ref[0, p, pl.ds(base, 16), :], -off, axis=0)[:8]
            rowsx = pltpu.roll(rx_ref[0, p, pl.ds(base, 16), :], -off, axis=0)[:8]
            vx = gather_pieces(rows, rowsx)
            new_top.append(acc_top[p] + jnp.where(m_top, vx, 0.0))
            new_bot.append(acc_bot[p] + jnp.where(m_bot, vx, 0.0))
        return tuple(new_top), tuple(new_bot)

    init = ((zero,) * n_planes, (zero,) * n_planes)
    acc_top, acc_bot = jax.lax.fori_loop(0, trip, body, init)
    for p in range(n_planes):
        out_ref[0, p] = acc_top[p] * (1.0 - wy) + acc_bot[p] * wy


@functools.partial(jax.jit, static_argnames=("interpret", "x_mode"))
def warp_bilinear_pallas(r_pad: jax.Array, rx_pad: jax.Array,
                         u: jax.Array, v: jax.Array,
                         interpret: bool = False, x_mode: str = "piece"):
    """Warp P packed planes by (u, v); returns [B, P, Ho, Wo] float32.

    r_pad/rx_pad come from :func:`pack_warp_operand`. (u, v) give each
    output pixel's displacement from its own (row, col); the output grid
    (u.shape) may differ from the source plane shape (absolute-grid
    sampling). The caller applies the out-of-bounds mask (same contract as
    ops.farneback._warp_bilinear). ``x_mode`` (see ``_kernel``): "roll"
    (dynamic lane rotation, one gather per band step in the common case) or
    "piece" (unconditional per-piece gathers).
    """
    B, P, hp, w = r_pad.shape
    h = hp - 2 * _PAD
    ho, wo = u.shape[1], u.shape[2]
    assert warp_supported(ho, wo) and w % 128 == 0, (B, P, h, w, ho, wo)
    return pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, n_planes=P, x_mode=x_mode),
        grid=(B, ho // 8, wo // 128),
        in_specs=[
            pl.BlockSpec((1, P, hp, w), lambda b, i, j: (b, 0, 0, 0)),
            pl.BlockSpec((1, P, hp, w), lambda b, i, j: (b, 0, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda b, i, j: (b, i, j)),
            pl.BlockSpec((1, 8, 128), lambda b, i, j: (b, i, j)),
        ],
        out_specs=pl.BlockSpec((1, P, 8, 128),
                               lambda b, i, j: (b, 0, i, j)),
        out_shape=jax.ShapeDtypeStruct((B, P, ho, wo), jnp.float32),
        interpret=interpret,
    )(r_pad, rx_pad, u, v)


def _ceil_to(n: int, m: int) -> int:
    return -(-n // m) * m


def _pad_w(x: jax.Array, wpad: int) -> jax.Array:
    return jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, wpad),), mode="edge")


def warp_planes_padded(planes, u: jax.Array, v: jax.Array,
                       interpret: bool = False,
                       x_mode: str = "piece") -> jax.Array:
    """Relative bilinear warp of [B, H, W] planes -> [B, P, H, W] via the
    band kernel, edge-padding W to lane alignment (H must be 8-aligned).

    Sampling matches the XLA packed warp for coords with x <= W-1 (the
    padded columns replicate column W-1, which is exactly the XLA path's
    corner clamp); out-of-bounds pixels are garbage the caller masks, same
    contract as ops.farneback._warp_bilinear. One-shot convenience — for
    warp-several-times-per-operand loops (Farnebäck levels), pack once with
    :func:`pack_warp_operand` on pre-padded planes instead.
    """
    B, H, W = u.shape
    wpad = (-W) % 128
    if wpad:
        planes = tuple(_pad_w(p, wpad) for p in planes)
        u = _pad_w(u, wpad)
        v = _pad_w(v, wpad)
    r_pad, rx_pad = pack_warp_operand(planes)
    out = warp_bilinear_pallas(r_pad, rx_pad, u, v, interpret=interpret,
                               x_mode=x_mode)
    return out[..., :W] if wpad else out


@functools.partial(jax.jit, static_argnames=("interpret", "x_mode"))
def sample_abs_pallas(img: jax.Array, fy: jax.Array, fx: jax.Array,
                      interpret: bool = False, x_mode: str = "piece") -> jax.Array:
    """Bilinear-sample ``img`` [B, h, w] at absolute coords [B, Ho, Wo].

    Coords must satisfy ``0 <= fy <= h-1``, ``0 <= fx <= w-1`` (the callers
    pre-clamp). Pads the source width and the output grid to Mosaic tile
    alignment, runs the band-warp kernel with one plane, and slices the
    padding back off. Matches models.dis._bilinear_abs_packed to f32
    rounding (tested).
    """
    B, h, w = img.shape
    Ho, Wo = fy.shape[1], fy.shape[2]
    wp = _ceil_to(w, 128)
    if wp != w:
        img = jnp.pad(img, ((0, 0), (0, 0), (0, wp - w)), mode="edge")
    r_pad, rx_pad = pack_warp_operand((img,))
    Hop, Wop = _ceil_to(Ho, 8), _ceil_to(Wo, 128)
    pad2 = ((0, 0), (0, Hop - Ho), (0, Wop - Wo))
    # edge-replicate the coords into the alignment padding: pad lanes then
    # sample the same source rows as their tile neighbors, so the adaptive
    # dy band stays tight (zero-filled coords would make every edge tile
    # walk a band from row 0 to its real rows); sliced off below
    fyp = jnp.pad(fy, pad2, mode="edge")
    fxp = jnp.pad(fx, pad2, mode="edge")
    ys = jax.lax.broadcasted_iota(jnp.float32, (Hop, Wop), 0)[None]
    xs = jax.lax.broadcasted_iota(jnp.float32, (Hop, Wop), 1)[None]
    out = warp_bilinear_pallas(r_pad, rx_pad, fxp - xs, fyp - ys,
                               interpret=interpret, x_mode=x_mode)
    return out[:, 0, :Ho, :Wo]
