"""Device-side (JAX) signal chain — static shapes, traced valid length.

TPU-native reformulation of the reference's inline per-video 1-D signal chain
(reference: FunscriptFlow.pyw:1266-1397). Every function takes a fixed-size
(padded) array plus a traced ``n`` (valid sample count) so one compiled
program serves a whole bucket of video lengths — XLA requires static shapes,
and per-video recompiles would dominate for folder batches.

Design notes (vs the host oracle in ``signal_host``):

* Integration is a *segmented prefix sum*: cut flags define affine elements
  ``c -> a*c + b`` composed with ``jax.lax.associative_scan`` — O(log n) depth
  instead of the reference's sequential Python loop (:1270-1279).
* The windowed detrend is expressed as a static grid of window slots
  (start = w * hop) with per-slot validity masks and a closed-form masked
  linear fit (two reductions per slot) — no data-dependent control flow.
  This grid is exact for signals without cumulative-flow discontinuities
  (|diff| > 1000, reference :1288); the rare discontinuity case re-anchors
  the reference's grid at each segment start and is routed to the exact host
  path by the pipeline (see ``signal_host.detrend``).
* Rolling min-max normalization uses ``lax.reduce_window`` with +/-inf
  padding, which reproduces the reference's shrink-at-edges window semantics
  (:1340-1349) in O(n) instead of the reference's O(n*win) Python loop.

``detrend_win`` / ``norm_win`` are static Python ints (they derive from the
per-video effective fps; callers bucket on them, reference :1287, :1335).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "integrate_flow",
    "detrend_single_segment",
    "binomial_smooth",
    "rolling_normalize",
    "keyframe_mask",
    "signal_chain_device",
]

BINOMIAL_KERNEL = (1 / 16, 1 / 4, 3 / 8, 1 / 4, 1 / 16)
DISCONTINUITY_THRESHOLD = 1000.0


def integrate_flow(dots: jax.Array, cuts: jax.Array) -> jax.Array:
    """Segmented midpoint integration + half-step shift (reference :1266-1284).

    ``cum[i] = cuts[i] ? 0 : cum[i-1] + (dots[i-1]+dots[i])/2`` as an
    associative scan over affine maps, then ``out[i] = (cum[i]+cum[i-1])/2``.
    Padded tail entries (beyond the valid length) should be 0/False; they
    produce ignorable values that downstream masks discard.
    """
    dots = dots.astype(jnp.float32) if dots.dtype != jnp.float64 else dots
    n = dots.shape[0]
    g = jnp.concatenate(
        [jnp.zeros((1,), dots.dtype), (dots[:-1] + dots[1:]) * 0.5]
    )
    keep = jnp.logical_not(cuts).astype(dots.dtype)
    # Element i applies c -> a[i]*c + b[i]; index 0 pins cum[0] = 0.
    a = keep.at[0].set(0.0)
    b = (g * keep).at[0].set(0.0)

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 * a2, b1 * a2 + b2

    _, cum = jax.lax.associative_scan(combine, (a, b))
    shifted = (cum + jnp.concatenate([cum[:1], cum[:-1]])) * 0.5
    return shifted.at[0].set(cum[0])


def _hann(t: jax.Array, length: jax.Array) -> jax.Array:
    """np.hanning of a traced length, evaluated at integer offsets ``t``.

    Matches ``np.hanning``: length 1 -> [1.0]; entries at t >= length are 0.
    """
    denom = jnp.maximum(length - 1, 1).astype(jnp.float32)
    w = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * t.astype(jnp.float32) / denom)
    w = jnp.where(length == 1, 1.0, w)
    return jnp.where(t < length, w, 0.0)


def _masked_linear_residual(y: jax.Array, t: jax.Array, length: jax.Array):
    """Residual after least-squares line fit over the first ``length`` samples.

    Closed form of the reference's per-window ``np.polyfit(deg=1)``
    (:1312-1314). ``y``/``t`` have a static trailing window axis; entries with
    ``t >= length`` are masked out of the fit and zeroed in the residual.
    """
    valid = (t < length).astype(y.dtype)
    L = jnp.maximum(length, 1).astype(y.dtype)
    tf = t.astype(y.dtype) * valid
    yv = y * valid
    st = jnp.sum(tf, axis=-1, keepdims=True)
    stt = jnp.sum(tf * tf, axis=-1, keepdims=True)
    sy = jnp.sum(yv, axis=-1, keepdims=True)
    sty = jnp.sum(tf * yv, axis=-1, keepdims=True)
    Lk = jnp.asarray(L)  # scalar or [..., 1]; broadcasts against the sums
    det = Lk * stt - st * st
    safe_det = jnp.where(det == 0, 1.0, det)
    slope = jnp.where(det == 0, 0.0, (Lk * sty - st * sy) / safe_det)
    intercept = (sy - slope * st) / Lk
    return (y - (slope * t.astype(y.dtype) + intercept)) * valid


def detrend_single_segment(x: jax.Array, n: jax.Array, detrend_win: int) -> jax.Array:
    """Windowed Hann overlap-add linear detrend, single-segment case.

    Exactly reproduces reference :1300-1331 when the signal has no
    discontinuity splits: < 5 samples -> mean-subtract (and x1e6 via the
    global ``/ max(weight_sum, 1e-6)`` with zero weights — a faithful quirk);
    <= win -> one Hann-weighted window; else windows of ``detrend_win`` on a
    hop = win//2 grid, truncated at ``n``.
    """
    P = x.shape[0]
    x = x.astype(jnp.float32)
    nf = jnp.maximum(n, 1).astype(x.dtype)
    i = jnp.arange(P)
    in_range = (i < n).astype(x.dtype)

    # --- case n < 5: mean subtraction, never weighted -> / 1e-6 at the end.
    mean = jnp.sum(x * in_range) / nf
    case_small = (x - mean) * in_range * 1e6

    # --- case 5 <= n <= win: one window spanning [0, n).
    res_single = _masked_linear_residual(x[None, :], i[None, :], n)[0]
    w_single = _hann(i, n)
    wsum_single = jnp.maximum(w_single, 1e-6)
    case_single = res_single * w_single / wsum_single

    # --- grid case: static window slots at start = w * hop.
    hop = max(detrend_win // 2, 1)
    n_slots = max(-(-(P - hop) // hop), 1)  # len(range(0, P - hop, hop))
    starts = jnp.arange(n_slots) * hop  # [W]
    t = jnp.arange(detrend_win)  # [win]
    idx = starts[:, None] + t[None, :]  # [W, win]
    # Window w is emitted iff start < n - hop (reference loop bound :1320);
    # its length is min(win, n - start) (truncation at the segment end :1321).
    slot_valid = starts < (n - hop)
    lengths = jnp.clip(n - starts, 0, detrend_win)  # [W]
    gathered = x[jnp.clip(idx, 0, P - 1)]  # [W, win]
    res = _masked_linear_residual(gathered, jnp.broadcast_to(t, idx.shape), lengths[:, None])
    w = _hann(jnp.broadcast_to(t, idx.shape), lengths[:, None])
    contrib_mask = slot_valid[:, None] & (t[None, :] < lengths[:, None])
    contrib_mask = contrib_mask.astype(x.dtype)
    acc = jnp.zeros(P, x.dtype).at[jnp.clip(idx, 0, P - 1).ravel()].add(
        (res * w * contrib_mask).ravel()
    )
    wsum = jnp.zeros(P, x.dtype).at[jnp.clip(idx, 0, P - 1).ravel()].add(
        (w * contrib_mask).ravel()
    )
    case_grid = acc / jnp.maximum(wsum, 1e-6)

    out = jnp.where(n < 5, case_small, jnp.where(n <= detrend_win, case_single, case_grid))
    return out * in_range


def binomial_smooth(x: jax.Array, n: jax.Array) -> jax.Array:
    """5-tap binomial smoothing, zero-padded 'same' conv (reference :1333).

    The valid region is zeroed beyond ``n`` first so the padded tail acts as
    the zero padding ``np.convolve(mode='same')`` sees at a true array end.
    """
    P = x.shape[0]
    x = x * (jnp.arange(P) < n).astype(x.dtype)
    k = jnp.array(BINOMIAL_KERNEL, x.dtype)
    return jnp.convolve(x, k, mode="same", precision=jax.lax.Precision.HIGHEST)


def rolling_normalize(x: jax.Array, n: jax.Array, norm_win: int) -> jax.Array:
    """Centered rolling min-max normalization to 0-100 (reference :1335-1349).

    ``norm_win`` forced odd; windows shrink at both the array start and the
    valid-length end (entries beyond ``n`` are excluded via +/-inf identity
    padding); a flat window maps to 50.
    """
    if norm_win % 2 == 0:
        norm_win += 1
    half = norm_win // 2
    P = x.shape[0]
    i = jnp.arange(P)
    big = jnp.array(jnp.inf, x.dtype)
    x_min_src = jnp.where(i < n, x, big)
    x_max_src = jnp.where(i < n, x, -big)
    wmin = jax.lax.reduce_window(
        x_min_src, big, jax.lax.min, (norm_win,), (1,), [(half, half)]
    )
    wmax = jax.lax.reduce_window(
        x_max_src, -big, jax.lax.max, (norm_win,), (1,), [(half, half)]
    )
    span = wmax - wmin
    out = jnp.where(span == 0, 50.0, (x - wmin) / jnp.where(span == 0, 1.0, span) * 100.0)
    return jnp.where(i < n, out, 0.0)


def keyframe_mask(norm: jax.Array, n: jax.Array) -> jax.Array:
    """Boolean keep-mask for local-extrema keyframe reduction (:1366-1374).

    True at index 0, at every interior slope-sign inversion
    ``(d1 < 0) != (d2 < 0)`` for 1 <= i <= n-2, and at index n-1. Host code
    compacts the mask into indices (and reproduces the reference's duplicate
    [0, 0] emission for n == 1).
    """
    P = norm.shape[0]
    prev = jnp.concatenate([norm[:1], norm[:-1]])
    nxt = jnp.concatenate([norm[1:], norm[-1:]])
    d1 = norm - prev
    d2 = nxt - norm
    inv = (d1 < 0) != (d2 < 0)
    i = jnp.arange(P)
    interior = (i >= 1) & (i <= n - 2)
    return (inv & interior) | (i == 0) | (i == n - 1)


@functools.partial(jax.jit, static_argnames=("detrend_win", "norm_win"))
def signal_chain_device(
    dots: jax.Array,
    cuts: jax.Array,
    n: jax.Array,
    detrend_win: int,
    norm_win: int,
):
    """Fused device signal chain: per-pair scalars -> (norm curve, keep mask).

    One jitted program per (padded length, detrend_win, norm_win) bucket.
    Returns the 0-100 normalized curve and the keyframe keep-mask; JSON
    emission (timestamps, pos inversion) stays on host where it belongs.
    """
    cum = integrate_flow(dots, cuts)
    det = detrend_single_segment(cum, n, detrend_win)
    smooth = binomial_smooth(det, n)
    norm = rolling_normalize(smooth, n, norm_win)
    return norm, keyframe_mask(norm, n)


def has_discontinuity(cum_flow) -> bool:
    """Host-side check for the detrend grid re-anchoring case (:1288-1294)."""
    import numpy as np

    d = np.abs(np.diff(np.asarray(cum_flow)))
    return bool((d > DISCONTINUITY_THRESHOLD).any())
