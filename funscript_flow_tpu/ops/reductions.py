"""Per-pair device reductions: center-of-motion, cut detection, radial projection.

Everything the reference computes per frame pair *after* the dense flow —
divergence-argmax center (FunscriptFlow.pyw:748-758, 884), mean-magnitude cut
flag (:888-894), +/-6-pair temporal center smoothing (:1200-1214), and the
camera-motion-cancelling weighted radial projection (:761-785) — batched over
the pair axis so flow fields never leave HBM; only [B] scalars and [B, 2]
centers return to host.

Flow travels as (u, v) planes, each [B, H, W] (TPU tiles the trailing two
axes; a trailing 2-channel axis would waste vector lanes — see
ops.farneback module docstring).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "divergence",
    "max_divergence_center",
    "mean_flow_magnitude",
    "smooth_centers",
    "radial_motion_weighted",
]

CENTER_SMOOTH_RADIUS = 6  # reference :1206 (6 pairs each direction)


def divergence(u: jax.Array, v: jax.Array) -> jax.Array:
    """np.gradient-style 'divergence' d(u)/drow + d(v)/dcol, [B, H, W].

    Faithful to the reference's axis pairing (FunscriptFlow.pyw:754): the
    x-flow component is differentiated along rows (axis 0) and the y-flow
    component along columns (axis 1) — not the mathematical divergence, but
    it is the behavior the center selection was tuned on (SURVEY.md §2.1 #8).
    Central differences in the interior, one-sided at the edges (np.gradient).
    """

    def grad(a, axis):
        lead = jax.lax.slice_in_dim(a, 1, 2, axis=axis) - jax.lax.slice_in_dim(a, 0, 1, axis=axis)
        n = a.shape[axis]
        mid = (jax.lax.slice_in_dim(a, 2, n, axis=axis) - jax.lax.slice_in_dim(a, 0, n - 2, axis=axis)) * 0.5
        tail = jax.lax.slice_in_dim(a, n - 1, n, axis=axis) - jax.lax.slice_in_dim(a, n - 2, n - 1, axis=axis)
        return jnp.concatenate([lead, mid, tail], axis=axis)

    return grad(u, 1) + grad(v, 2)


def max_divergence_center(u: jax.Array, v: jax.Array):
    """Argmax-of-|divergence| center per pair (reference :748-758, :884).

    Returns (centers [B, 2] float32 as (x, y), values [B]). First-occurrence
    argmax in row-major order, like np.argmax.
    """
    div = divergence(u, v)
    B, H, W = div.shape
    flat = jnp.abs(div).reshape(B, H * W)
    idx = jnp.argmax(flat, axis=1)
    y = (idx // W).astype(jnp.float32)
    x = (idx % W).astype(jnp.float32)
    val = jnp.take_along_axis(div.reshape(B, H * W), idx[:, None], axis=1)[:, 0]
    return jnp.stack([x, y], axis=-1), val


def mean_flow_magnitude(u: jax.Array, v: jax.Array) -> jax.Array:
    """Mean |flow| per pair, [B] — the cut statistic (reference :889-894)."""
    return jnp.mean(jnp.hypot(u, v), axis=(1, 2))


def smooth_centers(centers: jax.Array, n_valid: jax.Array,
                   radius: int = CENTER_SMOOTH_RADIUS) -> jax.Array:
    """Mean of each center with up to ``radius`` neighbors per side (:1203-1214).

    The window truncates at index 0 and at ``n_valid`` (the reference
    truncates at chunk edges; callers that stitch chunks pass a halo so this
    truncation only happens at true video edges). Windowed mean via cumsum
    (fine here: the scan is over the tiny pair axis, not a lane axis).
    """
    B = centers.shape[0]
    i = jnp.arange(B)
    cs = jnp.cumsum(centers, axis=0)
    zero = jnp.zeros((1, centers.shape[1]), centers.dtype)
    cs = jnp.concatenate([zero, cs], axis=0)  # cs[k] = sum of first k
    lo = jnp.maximum(i - radius, 0)
    hi = jnp.minimum(i + radius, jnp.maximum(n_valid - 1, 0))
    total = cs[hi + 1] - cs[lo]
    count = (hi - lo + 1).astype(centers.dtype)
    return total / count[:, None]


def radial_motion_weighted(u: jax.Array, v: jax.Array, centers: jax.Array,
                           cuts: jax.Array, pov_mode: bool = False) -> jax.Array:
    """Signed expansion scalar per pair (reference :761-785), [B].

    dot = flow . (pixel - center); POV mode returns the plain mean; otherwise
    the dot is weighted so the two sides of the center contribute equally in
    x and y (camera-motion cancellation, :781-783). Cut pairs return 0.
    """
    B, H, W = u.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)[None]
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)[None]
    cx = centers[:, 0][:, None, None]
    cy = centers[:, 1][:, None, None]
    dot = u * (xs - cx) + v * (ys - cy)
    if pov_mode:
        val = jnp.mean(dot, axis=(1, 2))
    else:
        wdot = jnp.where(xs > cx, dot * (W - xs) / W, dot * xs / W)
        wdot = jnp.where(ys > cy, wdot * (H - ys) / H, wdot * ys / H)
        val = jnp.mean(wdot, axis=(1, 2))
    return jnp.where(cuts, 0.0, val)
