"""Mesh construction + sharding rules.

The reference's parallelism is host-only (multiprocessing pools over frame
pairs, FunscriptFlow.pyw:1190,1232). The TPU-native equivalents
(SURVEY.md §2.4):

* **DP** — pair-batch windows sharded over a 1-D device mesh ("batch" axis);
  each chip runs the whole flow program on its own window; halos are
  replicated host-side (cheap: 13 frames per boundary).
* **SP** — the 1-D signal time axis sharded over the same mesh, with
  ppermute halo exchange and a distributed segmented scan (parallel.signal_sp).

No hand-written transport: XLA compiles the collectives onto ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "BATCH_AXIS", "P", "NamedSharding"]

BATCH_AXIS = "batch"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the first ``n_devices`` available devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None and len(devices) < n_devices:
            # validating multi-chip logic without the chips: fall back to the
            # virtual host platform (xla_force_host_platform_device_count)
            devices = jax.devices("cpu")
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"Requested {n_devices} devices, only {len(devices)} available"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (BATCH_AXIS,))
