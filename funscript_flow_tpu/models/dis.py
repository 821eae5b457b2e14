"""DIS (Dense Inverse Search) optical flow — the fast alternative backend.

The reference exposes a "DNN" backend selector that actually runs
``cv2.DISOpticalFlow_create(DISOPTICAL_FLOW_PRESET_FAST)`` (reference:
FunscriptFlow.pyw:948-980, SURVEY.md §2.1 #12) — a different, cheaper dense
flow than Farnebäck, chosen by users for speed; its output (and hence the
funscript) legitimately differs from the Farnebäck backend's.

From-scratch TPU-native implementation of the DIS essence (Kroeger,
Timofte, Dai, Van Gool — "Fast Optical Flow using Dense Inverse Search",
ECCV 2016, PAPERS.md): coarse-to-fine patch grid, inverse-compositional
gradient descent per patch, weighted densification. Structured for TPU:

* all patch extraction / densification is **static** strided slicing — the
  patch grid is fixed, so no gathers there;
* the only dynamic access is sampling I1 at each patch's current offset:
  all patch pixels laid out as one dense coordinate grid and fetched by a
  single packed 4-corner bilinear gather per descent step
  (:func:`_sample_patches_dense` — XLA:TPU gather cost scales with gathered
  *elements*, so the dense layout beats per-patch window gathers ~20x);
* every patch updates in parallel (we deliberately drop OpenCV's serial
  left-to-right spatial propagation, which cannot batch; quality recovered
  by starting from the upsampled coarser-level flow).

Deviations from cv2's DIS (documented; validated statistically in
tests/test_dis.py rather than bit-exact): no spatial propagation (cannot
batch; quality recovered by coarse-to-fine init), per-patch (not per-pixel)
densification weights.

Variational refinement (cv2 runs it per level for PRESET_FAST/MEDIUM,
``variational_refinement_iter=5``) is implemented Brox'04-style in
:func:`variational_refinement`: robust data (intensity + gradient constancy)
and smoothness terms, outer fixed-point relinearization, inner red-black SOR
(omega=1.6) — all elementwise ops + static shifts, so it is VPU-only and
cheap. Parameters mirror cv2's (alpha=20, delta=5, gamma=10, 5 fixed-point x
5 SOR sweeps, extracted from cv2.VariationalRefinement getters).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.image import gaussian_blur, resize_bilinear, sepconv

__all__ = ["DISConfig", "dis_flow_planes", "dis_flow", "variational_refinement"]


@dataclass(frozen=True)
class DISConfig:
    """cv2 DIS preset-shaped parameters (defaults = PRESET_FAST: finest
    scale 2, patch 8/4, 16 descent iterations, 5 refinement iterations —
    values read from cv2.DISOpticalFlow getters)."""

    finest_scale: int = 2
    patch_size: int = 8
    patch_stride: int = 4
    gd_iters: int = 16
    use_mean_norm: bool = True
    var_iters: int = 5          # variational fixed-point iterations (0 = off)
    var_alpha: float = 20.0     # smoothness weight
    var_delta: float = 5.0      # intensity-constancy weight
    var_gamma: float = 10.0     # gradient-constancy weight
    var_omega: float = 1.6      # SOR relaxation
    var_sor_iters: int = 5

    @classmethod
    def preset(cls, name: str) -> "DISConfig":
        """cv2 preset equivalents: ultrafast | fast | medium."""
        name = name.lower()
        if name == "ultrafast":
            return cls(gd_iters=12, var_iters=0)
        if name == "fast":
            return cls()
        if name == "medium":
            return cls(finest_scale=1, patch_stride=3, gd_iters=25)
        raise ValueError(f"Unknown DIS preset: {name}")


def _pyr_down(img: jax.Array) -> jax.Array:
    """Half-resolution: 5-tap binomial smooth + 2x subsample (pyrDown-like)."""
    k = np.array([1, 4, 6, 4, 1], np.float32) / 16.0
    sm = sepconv(img, k, k, border="reflect101")
    return sm[..., ::2, ::2]


def _sobel(img: jax.Array):
    """Sobel 3x3 gradients (cv2.spatialGradient convention)."""
    d = np.array([-1.0, 0.0, 1.0], np.float32)
    s = np.array([1.0, 2.0, 1.0], np.float32)
    return sepconv(img, s, d), sepconv(img, d, s)  # (d/dx, d/dy)


def _extract_patches(img: jax.Array, ny: int, nx: int, ps: int, stride: int):
    """[B, h, w] -> [B, ny, nx, ps*ps] via static strided slices (no gather)."""
    rows = []
    for dy in range(ps):
        cols = []
        for dx in range(ps):
            cols.append(
                jax.lax.slice(
                    img,
                    (0, dy, dx),
                    (img.shape[0], dy + (ny - 1) * stride + 1, dx + (nx - 1) * stride + 1),
                    (1, stride, stride),
                )
            )
        rows.append(jnp.stack(cols, axis=-1))  # [B, ny, nx, ps]
    return jnp.concatenate(rows, axis=-1)  # [B, ny, nx, ps*ps]


def _sample_patches(img: jax.Array, py, px, uy, ux, ps: int):
    """Bilinear-sample ps x ps patches of ``img`` at (py+uy, px+ux).

    img [B, h, w]; py/px static patch-corner grids [ny, nx]; uy/ux traced
    offsets [B, ny, nx]. Returns [B, ny, nx, ps*ps]. One packed 4-corner
    gather over all patch pixels (the only dynamic access in DIS).
    """
    B, h, w = img.shape
    ny, nx = py.shape
    fy = py[None] + uy
    fx = px[None] + ux
    # clamp the (ps+1)-wide sample window fully inside the image (cv2 clamps
    # patch positions too); the last valid start ``dim - ps`` is represented
    # as start ``dim - ps - 1`` with fractional weight 1, so positions cover
    # [0, dim - ps] continuously and the XLA gather never clips.
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, h - ps - 1)
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, w - ps - 1)
    wy = jnp.clip(fy - y0.astype(jnp.float32), 0.0, 1.0)[..., None]
    wx = jnp.clip(fx - x0.astype(jnp.float32), 0.0, 1.0)[..., None]

    # All ps*ps pixels of a patch share one fractional offset, so ONE gather
    # of a (ps+1, ps+1) window per patch suffices (gathers on this backend
    # are index-bound: per-patch windows are ~64x fewer indices than
    # per-pixel corners). The four bilinear corners are static sub-windows.
    idx = jnp.stack([y0.reshape(B, -1), x0.reshape(B, -1)], axis=-1)  # [B,np,2]
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0, 1)
    )

    def g(im, ix):
        return jax.lax.gather(im, ix, dn, slice_sizes=(ps + 1, ps + 1))

    win = jax.vmap(g)(img, idx).reshape(B, ny, nx, ps + 1, ps + 1)
    p00 = win[..., :ps, :ps].reshape(B, ny, nx, ps * ps)
    p01 = win[..., :ps, 1:].reshape(B, ny, nx, ps * ps)
    p10 = win[..., 1:, :ps].reshape(B, ny, nx, ps * ps)
    p11 = win[..., 1:, 1:].reshape(B, ny, nx, ps * ps)
    return (p00 * (1 - wx) * (1 - wy) + p01 * wx * (1 - wy)
            + p10 * (1 - wx) * wy + p11 * wx * wy)


def _sample_patches_dense(img: jax.Array, py, px, uy, ux, ps: int):
    """Drop-in equivalent of :func:`_sample_patches` via one dense grid.

    XLA:TPU gather cost scales with gathered *elements*, not indices — the
    per-patch ``(ps+1)^2`` window gather moves ``81x`` the patch-pixel count
    (the round-1 "fewer indices" reasoning optimized the wrong quantity).
    Reformulation: each patch pixel ``(dy, dx)`` of patch ``(pi, pj)``
    bilinearly samples ``img`` at ``(clip(py+uy, 0, h-ps) + dy, ...)`` —
    lay all patch pixels out as a dense ``[ny*ps, nx*ps]`` absolute
    coordinate grid and do ONE packed 4-corner gather over it (4 lanes per
    pixel), then fold back to ``[B, ny, nx, ps*ps]``.

    Exactness vs _sample_patches (tested): in-range coords share floor/frac;
    at the low clamp both give row 0 weight 1; at the high clamp
    ``y0 = h-ps-1, wy = 1`` equals sampling the integer row ``h-ps``.
    """
    B, h, w = img.shape
    ny, nx = py.shape
    fy = jnp.clip(py[None] + uy, 0.0, float(h - ps))  # effective patch corner
    fx = jnp.clip(px[None] + ux, 0.0, float(w - ps))
    d = jnp.arange(ps, dtype=jnp.float32)
    # dense absolute sample coords [B, ny*ps, nx*ps]
    fyd = (fy[:, :, None, :, None] + d[None, None, :, None, None])
    fxd = (fx[:, :, None, :, None] + d[None, None, None, None, :])
    fyd = jnp.broadcast_to(fyd, (B, ny, ps, nx, ps)).reshape(B, ny * ps, nx * ps)
    fxd = jnp.broadcast_to(fxd, (B, ny, ps, nx, ps)).reshape(B, ny * ps, nx * ps)

    if jax.default_backend() == "tpu":
        # Mosaic band-warp kernel: dynamic_gather shuffles instead of the
        # XLA gather (same kernel as the Farnebäck warp, 1 plane, absolute
        # coords) — the dense grid is exactly the layout it wants.
        from ..ops.pallas.warp import sample_abs_pallas

        val = sample_abs_pallas(img, fyd, fxd)
    else:
        val = _bilinear_abs_packed(img, fyd, fxd)
    return (val.reshape(B, ny, ps, nx, ps)
               .transpose(0, 1, 3, 2, 4)
               .reshape(B, ny, nx, ps * ps))


def _bilinear_abs_packed(img: jax.Array, fy: jax.Array, fx: jax.Array):
    """Bilinear-sample ``img`` [B, h, w] at absolute coords (fy, fx) [B, H, W].

    Coords must satisfy ``0 <= f <= dim-1``. Single packed 4-corner gather:
    the (y+1, x+1) neighbors ride as extra lanes of an edge-replicated
    operand, so one ``take_along_axis`` fetches all four corners (the same
    trick as ops.farneback._warp_bilinear, reference flow warp :878-879).
    """
    B, h, w = img.shape
    H, W = fy.shape[1], fy.shape[2]
    y0 = jnp.floor(fy)
    x0 = jnp.floor(fx)
    wy = (fy - y0).reshape(B, H * W, 1)
    wx = (fx - x0).reshape(B, H * W, 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    idx = (y0i * w + x0i).reshape(B, H * W)

    iy = jnp.concatenate([img[:, 1:, :], img[:, h - 1:, :]], axis=1)
    ix = jnp.concatenate([img[:, :, 1:], img[:, :, w - 1:]], axis=2)
    ixy = jnp.concatenate([iy[:, :, 1:], iy[:, :, w - 1:]], axis=2)
    packed = jnp.stack(
        [img.reshape(B, h * w), ix.reshape(B, h * w),
         iy.reshape(B, h * w), ixy.reshape(B, h * w)], axis=-1)
    g = jnp.take_along_axis(packed, idx[..., None], axis=1)
    val = (g[..., 0] * (1 - wx[..., 0]) + g[..., 1] * wx[..., 0]) * (1 - wy[..., 0]) \
        + (g[..., 2] * (1 - wx[..., 0]) + g[..., 3] * wx[..., 0]) * wy[..., 0]
    return val.reshape(B, H, W)


def _d5(img: jax.Array):
    """5-point derivative stencil [-1, 8, 0, -8, 1]/12 (Brox'04), replicate
    borders; returns (d/dx, d/dy)."""
    k = np.array([-1.0, 8.0, 0.0, -8.0, 1.0], np.float32) / 12.0
    one = np.array([1.0], np.float32)
    # sepconv performs correlation; flip for convolution-style derivative
    kc = k[::-1].copy()
    return sepconv(img, one, kc), sepconv(img, kc, one)


def _shift_nb(x: jax.Array, dy: int, dx: int) -> jax.Array:
    """Neighbor value at (y+dy, x+dx), zero outside the image."""
    pad = [(0, 0)] * (x.ndim - 2)
    pad += [(max(0, -dy), max(0, dy)), (max(0, -dx), max(0, dx))]
    xp = jnp.pad(x, pad)
    h, w = x.shape[-2], x.shape[-1]
    y0, x0 = max(0, dy), max(0, dx)
    return xp[..., y0 : y0 + h, x0 : x0 + w]


def variational_refinement(I0, I1, u, v, cfg: DISConfig):
    """Brox-style dense refinement of (u, v) on one pyramid level.

    Energy: delta*psi(|I(x+w)-I(x)|^2) + gamma*psi(|grad I(x+w)-grad I(x)|^2)
    + alpha*psi(|grad w|^2), psi(s) = sqrt(s + eps^2). One linearization
    around the incoming flow (I1 + gradients warped once), ``var_iters``
    fixed-point reweightings, each solved by ``var_sor_iters`` red-black SOR
    sweeps — pure elementwise/shift ops, no gathers beyond the single warp.
    Mirrors the refinement cv2's DIS runs per level for PRESET_FAST
    (reference backend: FunscriptFlow.pyw:953-956).
    """
    from ..ops.farneback import _warp_bilinear

    B, h, w = I0.shape
    eps2 = 0.001 ** 2

    # clamp target coords so the warp is edge-sampling, never out-of-bounds
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)[None]
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)[None]
    uc = jnp.clip(xs + u, 0.0, w - 1.0) - xs
    vc = jnp.clip(ys + v, 0.0, h - 1.0) - ys

    I1x, I1y = _d5(I1)
    if jax.default_backend() == "tpu" and h % 8 == 0:
        # band-warp Mosaic kernel (profiled ~4x the XLA packed gather here);
        # coords are pre-clamped above, so every pixel is in-bounds and the
        # XLA path's inb mask is vacuous
        from ..ops.pallas.warp import warp_planes_padded

        warped = warp_planes_padded((I1, I1x, I1y), uc, vc)
        W1, W1x, W1y = warped[:, 0], warped[:, 1], warped[:, 2]
    else:
        (W1, W1x, W1y), _ = _warp_bilinear((I1, I1x, I1y), uc, vc)

    Ax, Ay = 0.5 * (W1x + _d5(I0)[0]), 0.5 * (W1y + _d5(I0)[1])
    Iz = W1 - I0
    Axx, Axy = _d5(Ax)
    Ayx, Ayy = _d5(Ay)
    Axy = 0.5 * (Axy + Ayx)
    Ixz, Iyz = _d5(Iz)

    du = jnp.zeros_like(u)
    dv = jnp.zeros_like(v)
    iy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    red = ((iy + ix) % 2 == 0)[None]
    nbs = ((0, 1), (0, -1), (1, 0), (-1, 0))
    inside = jnp.ones((1, h, w), jnp.float32)

    for _ in range(cfg.var_iters):
        # robust data weights at the current increment
        r_d = Iz + Ax * du + Ay * dv
        w_d = cfg.var_delta / jnp.sqrt(r_d * r_d + eps2)
        r_gx = Ixz + Axx * du + Axy * dv
        r_gy = Iyz + Axy * du + Ayy * dv
        w_g = cfg.var_gamma / jnp.sqrt(r_gx * r_gx + r_gy * r_gy + eps2)
        a11 = w_d * Ax * Ax + w_g * (Axx * Axx + Axy * Axy)
        a12 = w_d * Ax * Ay + w_g * (Axy * (Axx + Ayy))
        a22 = w_d * Ay * Ay + w_g * (Axy * Axy + Ayy * Ayy)
        b1 = -(w_d * Ax * Iz + w_g * (Axx * Ixz + Axy * Iyz))
        b2 = -(w_d * Ay * Iz + w_g * (Axy * Ixz + Ayy * Iyz))

        # robust smoothness weight of the full flow (u+du, v+dv)
        fu, fv = u + du, v + dv
        gux, guy = _d5(fu)
        gvx, gvy = _d5(fv)
        sw = cfg.var_alpha / jnp.sqrt(
            gux * gux + guy * guy + gvx * gvx + gvy * gvy + eps2
        )
        wn = [0.5 * (sw + _shift_nb(sw, dy, dx)) * _shift_nb(inside, dy, dx)
              for dy, dx in nbs]
        wsum = wn[0] + wn[1] + wn[2] + wn[3]
        # smoothness acts on the FULL flow u+du: the base-flow diffusion
        # term sum_n w_n (u_n - u) is constant across SOR sweeps
        su = sum(wk * _shift_nb(u, dy, dx) for wk, (dy, dx) in zip(wn, nbs)) - wsum * u
        sv = sum(wk * _shift_nb(v, dy, dx) for wk, (dy, dx) in zip(wn, nbs)) - wsum * v
        b1s = b1 + su
        b2s = b2 + sv

        for _s in range(cfg.var_sor_iters):
            for mask in (red, ~red):
                nb_u = sum(wk * _shift_nb(du, dy, dx)
                           for wk, (dy, dx) in zip(wn, nbs))
                gs_u = (b1s - a12 * dv + nb_u) / (a11 + wsum + 1e-6)
                du = jnp.where(mask, du + cfg.var_omega * (gs_u - du), du)
                nb_v = sum(wk * _shift_nb(dv, dy, dx)
                           for wk, (dy, dx) in zip(wn, nbs))
                gs_v = (b2s - a12 * du + nb_v) / (a22 + wsum + 1e-6)
                dv = jnp.where(mask, dv + cfg.var_omega * (gs_v - dv), dv)

    return u + du, v + dv


def _dis_level(I0, I1, u, v, cfg: DISConfig):
    """One pyramid level: patch inverse search + densification.

    u, v: [B, h, w] initial flow at this level (from the coarser level).
    """
    B, h, w = I0.shape
    ps, st = cfg.patch_size, cfg.patch_stride
    ny = (h - ps) // st + 1
    nx = (w - ps) // st + 1
    py = (np.arange(ny) * st)[:, None] * np.ones((1, nx))
    px = np.ones((ny, 1)) * (np.arange(nx) * st)[None, :]
    py = jnp.asarray(py, jnp.float32)
    px = jnp.asarray(px, jnp.float32)

    gx, gy = _sobel(I0)
    T = _extract_patches(I0, ny, nx, ps, st)
    Tx = _extract_patches(gx, ny, nx, ps, st)
    Ty = _extract_patches(gy, ny, nx, ps, st)
    if cfg.use_mean_norm:
        T = T - T.mean(axis=-1, keepdims=True)

    h11 = jnp.sum(Tx * Tx, -1) + 1e-3
    h12 = jnp.sum(Tx * Ty, -1)
    h22 = jnp.sum(Ty * Ty, -1) + 1e-3
    idet = 1.0 / (h11 * h22 - h12 * h12)

    # init patch offsets from the incoming dense flow at patch centers
    cy = (np.arange(ny) * st + ps // 2).astype(int)
    cx = (np.arange(nx) * st + ps // 2).astype(int)
    pu = u[:, cy][:, :, cx]
    pv = v[:, cy][:, :, cx]

    max_disp = float(max(h, w))

    def step(carry, _):
        pu, pv = carry
        P1 = _sample_patches_dense(I1, py, px, pv, pu, ps)
        if cfg.use_mean_norm:
            P1 = P1 - P1.mean(axis=-1, keepdims=True)
        r = P1 - T
        g1 = jnp.sum(Tx * r, -1)
        g2 = jnp.sum(Ty * r, -1)
        du = (h22 * g1 - h12 * g2) * idet
        dv = (h11 * g2 - h12 * g1) * idet
        pu = jnp.clip(pu - du, -max_disp, max_disp)
        pv = jnp.clip(pv - dv, -max_disp, max_disp)
        return (pu, pv), None

    (pu, pv), _ = jax.lax.scan(step, (pu, pv), None, length=cfg.gd_iters)

    # densification weights: inverse residual energy per patch
    P1 = _sample_patches_dense(I1, py, px, pv, pu, ps)
    if cfg.use_mean_norm:
        P1 = P1 - P1.mean(axis=-1, keepdims=True)
    lam = 1.0 / jnp.maximum(1.0, jnp.mean((P1 - T) ** 2, -1))

    # col2im: static strided scatter of (weight, weight*u, weight*v)
    acc_w = jnp.zeros((B, h, w), jnp.float32)
    acc_u = jnp.zeros((B, h, w), jnp.float32)
    acc_v = jnp.zeros((B, h, w), jnp.float32)
    ylim = (ny - 1) * st + 1
    xlim = (nx - 1) * st + 1
    for dy in range(ps):
        for dx in range(ps):
            sl = (slice(None), slice(dy, dy + ylim, st), slice(dx, dx + xlim, st))
            acc_w = acc_w.at[sl].add(lam)
            acc_u = acc_u.at[sl].add(lam * pu)
            acc_v = acc_v.at[sl].add(lam * pv)
    safe = jnp.maximum(acc_w, 1e-6)
    covered = acc_w > 0
    return (
        jnp.where(covered, acc_u / safe, u),
        jnp.where(covered, acc_v / safe, v),
    )


def dis_flow_planes(f0: jax.Array, f1: jax.Array, cfg: DISConfig | None = None):
    """DIS dense flow, plane layout: [B, H, W] pair batch -> (u, v) planes."""
    cfg = cfg or DISConfig()
    f0 = f0.astype(jnp.float32)
    f1 = f1.astype(jnp.float32)
    B, H, W = f0.shape

    coarsest = max(
        cfg.finest_scale,
        int(round(math.log2(max(H, W) / (4.0 * cfg.patch_size)))),
    )
    # pyramids: index k = scale 2^-k
    pyr0 = [f0]
    pyr1 = [f1]
    for _ in range(coarsest):
        pyr0.append(_pyr_down(pyr0[-1]))
        pyr1.append(_pyr_down(pyr1[-1]))

    lh, lw = pyr0[coarsest].shape[1:]
    u = jnp.zeros((B, lh, lw), jnp.float32)
    v = jnp.zeros((B, lh, lw), jnp.float32)
    for k in range(coarsest, cfg.finest_scale - 1, -1):
        if k != coarsest:
            lh, lw = pyr0[k].shape[1:]
            u = resize_bilinear(u, lh, lw) * 2.0
            v = resize_bilinear(v, lh, lw) * 2.0
        u, v = _dis_level(pyr0[k], pyr1[k], u, v, cfg)
        if cfg.var_iters > 0:
            u, v = variational_refinement(pyr0[k], pyr1[k], u, v, cfg)

    scale = float(1 << cfg.finest_scale)
    u = resize_bilinear(u, H, W) * scale
    v = resize_bilinear(v, H, W) * scale
    return u, v


def dis_flow(f0: jax.Array, f1: jax.Array, cfg: DISConfig | None = None) -> jax.Array:
    """[B, H, W, 2] convenience wrapper (cv2.DISOpticalFlow.calc shape)."""
    u, v = dis_flow_planes(f0, f1, cfg)
    return jnp.stack([u, v], axis=-1)
