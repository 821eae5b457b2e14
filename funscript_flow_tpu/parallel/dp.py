"""Data-parallel flow analysis: pair windows sharded over the device mesh.

Each device receives one contiguous frame window (with 1-frame flow halo and
6-pair center-smoothing halo prepared host-side, mirroring the single-chip
streaming stitcher in models.pipeline) and runs the full fused program
locally under ``shard_map``. Valid-pair bookkeeping travels as a per-device
scalar so truncation only happens at true video edges.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..models.pipeline import PipelineConfig, flow_chunk_program
from ..ops.reductions import CENTER_SMOOTH_RADIUS

__all__ = ["shard_video_windows", "analyze_windows_sharded", "analyze_multichip"]


@functools.lru_cache(maxsize=None)
def _sharded_window_program(mesh, cfg: PipelineConfig):
    """shard_map'd fused flow program: one halo'd window per device."""
    (axis,) = mesh.axis_names

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P(axis), P(axis)), out_specs=P(axis)
    )
    def run(win, nv):
        res = flow_chunk_program(win[0], nv[0], cfg)
        return jax.tree.map(lambda x: x[None], res)

    return run


def analyze_windows_sharded(windows, n_valid, cfg: PipelineConfig, mesh):
    """windows [D, F, H, W, 3] uint8, n_valid [D] -> per-device result dict
    (leaves shaped [D, ...]), still on device."""
    run = _sharded_window_program(mesh, cfg)
    return run(jnp.asarray(windows), jnp.asarray(n_valid, jnp.int32))


def shard_video_windows(frames: np.ndarray, n_devices: int, pairs_per_device: int):
    """Split a video's frame stream into per-device halo'd windows.

    frames [N, H, W, 3] -> (windows [D, F, H, W, 3], n_valid [D], lo [D], hi [D])
    where window d covers emitted pairs [d*ppd, min((d+1)*ppd, n_pairs)) and
    F = pairs_per_device + 2*radius + 1 frames.
    """
    r = CENTER_SMOOTH_RADIUS
    n_pairs = frames.shape[0] - 1
    F = pairs_per_device + 2 * r + 1
    windows, n_valid, lo, hi = [], [], [], []
    for d in range(n_devices):
        s = min(d * pairs_per_device, n_pairs)
        e = min(s + pairs_per_device, n_pairs)
        a = max(0, s - r)
        b = min(n_pairs, e + r)
        w = frames[a : b + 1]
        if w.shape[0] < F:
            w = np.concatenate([w, np.repeat(w[-1:], F - w.shape[0], axis=0)], axis=0)
        windows.append(w)
        n_valid.append(b - a)
        lo.append(s - a)
        hi.append(e - a)
    return (np.stack(windows), np.asarray(n_valid, np.int32),
            np.asarray(lo, np.int32), np.asarray(hi, np.int32))


def analyze_multichip(frames: np.ndarray, cfg: PipelineConfig, mesh) -> dict:
    """Run the fused flow program data-parallel over ``mesh``.

    Returns the same per-pair dict as FlowAnalyzer.analyze_video_pairs, for
    all N-1 pairs, independent of the device count (tested on the virtual
    CPU mesh).
    """
    from ..utils.devsync import DEVICE_LOCK

    D = mesh.devices.size
    windows, n_valid, lo, hi = shard_video_windows(frames, D, cfg.pair_batch)
    with DEVICE_LOCK:
        res = analyze_windows_sharded(windows, n_valid, cfg, mesh)
        res = jax.device_get(res)
    out = {}
    for k, v in res.items():
        out[k] = np.concatenate([v[d, lo[d] : hi[d]] for d in range(D)], axis=0)
    return out
