"""Sequence-parallel (time-axis-sharded) signal chain.

For a single huge video, the per-pair scalar timeline is sharded over the
mesh and the whole 1-D chain runs distributed (SURVEY.md §2.4 SP row):

* integration — the cut-segmented prefix sum becomes a *distributed*
  segmented scan: local ``associative_scan`` over affine maps, one
  ``all_gather`` of per-shard composites, exclusive carry applied locally;
* detrend — the global Hann window grid is recomputed per shard from its
  global offset; a ``ppermute`` halo of ``detrend_win`` samples per side
  lets every shard evaluate every window overlapping its range (straddling
  windows are computed redundantly on both neighbors — deterministic, so
  the overlap-add agrees);
* smoothing / rolling normalization / keyframe mask — ppermute halos of
  2 / norm_win//2 / 1 samples, then purely local work.

All `_sp` functions run *inside* ``shard_map`` over a 1-D mesh axis; the
public wrapper ``signal_chain_sharded`` handles padding and sharding.
Matches ``ops.signal.signal_chain_device`` for n > detrend_win (the sharded
path assumes the window-grid detrend branch; shorter signals belong on one
device — runner.compute_actions routes them there).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..ops.signal import BINOMIAL_KERNEL, _hann, _masked_linear_residual

__all__ = ["signal_chain_sp", "signal_chain_sharded"]

_F32 = jnp.float32


def _halo(x: jax.Array, k: int, axis: str):
    """(left, right): k trailing samples of the left neighbor / k leading of
    the right (ring-wrapped; edge shards mask by global index)."""
    D = jax.lax.axis_size(axis)
    to_right = [(i, (i + 1) % D) for i in range(D)]
    to_left = [(i, (i - 1) % D) for i in range(D)]
    left = jax.lax.ppermute(x[-k:], axis, to_right)
    right = jax.lax.ppermute(x[:k], axis, to_left)
    return left, right


def _integrate_sp(dots, cuts, n, axis):
    """Distributed segmented midpoint integration + half-step shift."""
    L = dots.shape[0]
    g0 = jax.lax.axis_index(axis) * L
    gi = g0 + jnp.arange(L)

    dl, _ = _halo(dots, 1, axis)
    dprev = jnp.concatenate([dl, dots[:-1]])
    g = (dprev + dots) * 0.5
    keep = jnp.logical_not(cuts).astype(_F32)
    a = jnp.where(gi == 0, 0.0, keep)
    b = jnp.where(gi == 0, 0.0, g * keep)
    a = jnp.where(gi >= n, 1.0, a)  # identity past the valid range
    b = jnp.where(gi >= n, 0.0, b)

    def combine(l, r):
        a1, b1 = l
        a2, b2 = r
        return a1 * a2, b1 * a2 + b2

    A, B = jax.lax.associative_scan(combine, (a, b))

    # exclusive inter-shard carry: value of cum at the left edge of my shard
    As = jax.lax.all_gather(A[-1], axis)  # [D]
    Bs = jax.lax.all_gather(B[-1], axis)
    D = As.shape[0]

    def fold(carry, ab):
        av, bv = ab
        v = av * carry + bv
        return v, carry  # emit the *exclusive* prefix

    _, excl = jax.lax.scan(fold, jnp.asarray(0.0, _F32), (As, Bs))
    carry = excl[jax.lax.axis_index(axis)]

    cum = A * carry + B
    cl, _ = _halo(cum, 1, axis)
    cumprev = jnp.concatenate([cl, cum[:-1]])
    shifted = (cum + cumprev) * 0.5
    return jnp.where(gi == 0, cum, shifted)


def _detrend_sp(x, n, detrend_win, axis):
    """Window-grid Hann overlap-add detrend with a detrend_win halo."""
    L = x.shape[0]
    win = detrend_win
    hop = max(win // 2, 1)
    g0 = jax.lax.axis_index(axis) * L
    gi = g0 + jnp.arange(L)

    k = win
    lh, rh = _halo(x, k, axis)
    xx = jnp.concatenate([lh, x, rh])
    gxx = g0 - k + jnp.arange(L + 2 * k)
    xx = jnp.where((gxx >= 0) & (gxx < n), xx, 0.0)

    # global window grid: starts = m*hop overlapping (g0 - win, g0 + L)
    m_min = jnp.floor_divide(g0 - win, hop) + 1
    Wmax = (L + win) // hop + 2  # static slot count
    starts = (m_min + jnp.arange(Wmax)) * hop  # traced global starts
    slot_valid = (starts >= 0) & (starts < n - hop) & \
                 (starts < g0 + L) & (starts + win > g0)
    lengths = jnp.clip(n - starts, 0, win)

    t = jnp.arange(win)
    concat_pos = (starts[:, None] - g0 + k) + t[None, :]       # [W, win] in [0, L+2k)
    gathered = xx[jnp.clip(concat_pos, 0, L + 2 * k - 1)]
    tb = jnp.broadcast_to(t, concat_pos.shape)
    res = _masked_linear_residual(gathered, tb, lengths[:, None])
    w = _hann(tb, lengths[:, None])
    mask = (slot_valid[:, None] & (t[None, :] < lengths[:, None])).astype(_F32)

    flat_pos = jnp.clip(concat_pos, 0, L + 2 * k - 1).ravel()
    acc = jnp.zeros(L + 2 * k, _F32).at[flat_pos].add((res * w * mask).ravel())
    wsum = jnp.zeros(L + 2 * k, _F32).at[flat_pos].add((w * mask).ravel())
    y = acc[k : k + L] / jnp.maximum(wsum[k : k + L], 1e-6)
    return jnp.where(gi < n, y, 0.0)


def _binomial_sp(x, n, axis):
    L = x.shape[0]
    g0 = jax.lax.axis_index(axis) * L
    gi = g0 + jnp.arange(L)
    x = jnp.where(gi < n, x, 0.0)
    lh, rh = _halo(x, 2, axis)
    xx = jnp.concatenate([lh, x, rh])
    gxx = g0 - 2 + jnp.arange(L + 4)
    xx = jnp.where((gxx >= 0) & (gxx < n), xx, 0.0)
    out = jnp.zeros(L, _F32)
    for j, kv in enumerate(BINOMIAL_KERNEL):
        out = out + kv * jax.lax.dynamic_slice_in_dim(xx, j, L)
    return out


def _rolling_norm_sp(x, n, norm_win, axis):
    if norm_win % 2 == 0:
        norm_win += 1
    h = norm_win // 2
    L = x.shape[0]
    g0 = jax.lax.axis_index(axis) * L
    gi = g0 + jnp.arange(L)
    big = jnp.asarray(jnp.inf, _F32)

    def windowed(src, fill, op):
        s = jnp.where(gi < n, src, fill)
        lh, rh = _halo(s, h, axis)
        xx = jnp.concatenate([lh, s, rh])
        gxx = g0 - h + jnp.arange(L + 2 * h)
        xx = jnp.where((gxx >= 0) & (gxx < n), xx, fill)
        return jax.lax.reduce_window(xx, fill, op, (norm_win,), (1,), "valid")

    wmin = windowed(x, big, jax.lax.min)
    wmax = windowed(x, -big, jax.lax.max)
    span = wmax - wmin
    out = jnp.where(span == 0, 50.0, (x - wmin) / jnp.where(span == 0, 1.0, span) * 100.0)
    return jnp.where(gi < n, out, 0.0)


def _keyframe_sp(norm, n, axis):
    L = norm.shape[0]
    g0 = jax.lax.axis_index(axis) * L
    gi = g0 + jnp.arange(L)
    lh, rh = _halo(norm, 1, axis)
    prev = jnp.concatenate([lh, norm[:-1]])
    nxt = jnp.concatenate([norm[1:], rh])
    d1 = norm - prev
    d2 = nxt - norm
    inv = (d1 < 0) != (d2 < 0)
    interior = (gi >= 1) & (gi <= n - 2)
    return (inv & interior) | (gi == 0) | (gi == n - 1)


def signal_chain_sp(dots, cuts, n, detrend_win, norm_win, axis):
    """Full sharded chain; runs inside shard_map over ``axis``."""
    cum = _integrate_sp(dots, cuts, n, axis)
    det = _detrend_sp(cum, n, detrend_win, axis)
    sm = _binomial_sp(det, n, axis)
    norm = _rolling_norm_sp(sm, n, norm_win, axis)
    return norm, _keyframe_sp(norm, n, axis)


def signal_chain_sharded(dots: np.ndarray, cuts: np.ndarray, mesh,
                         detrend_win: int, norm_win: int):
    """Host API: shard a whole-video signal over ``mesh`` and run the chain.

    Pads to a per-device multiple; returns (norm [n], keep_mask [n]).
    """
    (axis,) = mesh.axis_names
    D = mesh.devices.size
    n = len(dots)
    L = -(-n // D)
    Pn = L * D
    dpad = np.zeros(Pn, np.float32)
    dpad[:n] = dots
    cpad = np.zeros(Pn, bool)
    cpad[:n] = cuts

    fn = shard_map(
        functools.partial(signal_chain_sp, detrend_win=detrend_win,
                          norm_win=norm_win, axis=axis),
        mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=(P(axis), P(axis)),
        # the inter-shard carry mixes all_gather'ed (axis-varying) values
        # with a replicated init; skip the varying-axes check
        check_vma=False,
    )
    norm, mask = jax.jit(fn)(jnp.asarray(dpad), jnp.asarray(cpad), jnp.int32(n))
    return np.asarray(norm)[:n], np.asarray(mask)[:n]
