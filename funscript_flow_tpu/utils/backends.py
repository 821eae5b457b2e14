"""Backend/device detection (reference: get_available_backends/get_gpu_info,
FunscriptFlow.pyw:32-100).

The reference probes cv2 for CUDA device counts, OpenCL availability, and
the DNN module; the TPU framework's equivalents are the JAX device
inventory, the DIS algorithm (always available — pure JAX), and the native
C++ decode runtime.
"""

from __future__ import annotations

__all__ = ["get_available_backends", "get_device_info"]


def get_available_backends() -> dict:
    """{backend_name: available} for every selectable backend."""
    out = {"TPU": False, "DIS": True, "CPU": True, "native_decode": False}
    try:
        import jax

        devs = jax.devices()
        # an accelerator platform must actually be present; a CPU-only JAX
        # install does NOT make the TPU backend available (round-1 bug: an
        # `or bool(devs)` clause here reported TPU=True on CPU-only boxes)
        out["TPU"] = any(d.platform != "cpu" for d in devs)
    except Exception:
        pass
    try:
        from .. import runtime as native_rt

        out["native_decode"] = native_rt.available()
    except Exception:
        pass
    return out


def get_device_info() -> str:
    """Human-readable accelerator inventory (reference's get_gpu_info analog)."""
    lines = []
    try:
        import jax

        for d in jax.devices():
            lines.append(f"{d.platform}: {d.device_kind} (id {d.id})")
        lines.append(f"default backend: {jax.default_backend()}")
    except Exception as e:
        lines.append(f"JAX unavailable: {e}")
    return "\n".join(lines)
