"""Contention-immune device-time measurement.

The shared TPU pool this framework is benchmarked on shows transient multi-x
wall-clock noise (NOTES_ROUND2.md) — back-to-back wall timings of identical
programs can differ 3x, so kernel A/B decisions made on wall clock are
garbage. Device-side execution time is immune to queueing: this helper runs
a callable under ``jax.profiler.trace`` and sums the TPU plane's per-program
("XLA Modules") durations from the emitted xplane proto.

Works through the remote-device tunnel (verified). The xplane proto parser
ships with the preinstalled tensorflow; the import is deferred so the
production pipeline never depends on it.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import jax

__all__ = ["device_profile"]


def device_profile(fn, *args, runs: int = 3, top: int = 0, label: str = ""):
    """Return mean on-device ms per call of ``fn(*args)`` over ``runs`` runs.

    ``top`` > 0 also prints the top-N HLO ops by device time (the "XLA Ops"
    line) — the per-kernel breakdown used to find hot spots.
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # deferred

    from .devsync import DEVICE_LOCK

    d = tempfile.mkdtemp(prefix="devprof_")
    try:
        # the whole trace holds DEVICE_LOCK: a concurrent prewarm/dispatch
        # would both pollute the measurement and risk the relay-client
        # concurrency wedge (utils.devsync)
        with DEVICE_LOCK:
            jax.device_get(fn(*args))  # warm/compile outside the trace
            with jax.profiler.trace(d):
                for _ in range(runs):
                    r = fn(*args)
                jax.device_get(r)
        files = glob.glob(os.path.join(d, "**", "*.xplane.pb"), recursive=True)
        xs = xplane_pb2.XSpace()
        with open(files[-1], "rb") as f:
            xs.ParseFromString(f.read())
    finally:
        shutil.rmtree(d, ignore_errors=True)

    total = 0
    ops: dict = {}
    for p in xs.planes:
        if not p.name.startswith("/device:TPU"):
            continue
        for line in p.lines:
            if line.name == "XLA Modules":
                for ev in line.events:
                    total += ev.duration_ps
            elif line.name == "XLA Ops" and top:
                for ev in line.events:
                    name = p.event_metadata[ev.metadata_id].name
                    ops[name] = ops.get(name, 0) + ev.duration_ps

    per_run = total / 1e9 / runs
    print(f"{label or getattr(fn, '__name__', 'fn')}: "
          f"{per_run:.2f} ms/run device time", flush=True)
    for k, v in sorted(ops.items(), key=lambda x: -x[1])[:top]:
        print(f"   {v / 1e9 / runs:9.3f} ms  {k[:140]}", flush=True)
    return per_run
