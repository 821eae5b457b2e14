"""Persistent XLA compilation cache.

The fused flow program compiles once per (micro-batch shape, config); on a
fresh process that costs minutes of wall clock. Enabling JAX's on-disk cache
makes every CLI invocation after the first start hot — essential for the
reference's usage pattern of many short batch runs (folder mode already
amortizes within one process).
"""

from __future__ import annotations

import os

__all__ = ["enable_persistent_cache"]

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/funscript_flow_tpu/xla")


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "FUNSCRIPT_FLOW_TPU_CACHE", DEFAULT_CACHE_DIR
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
