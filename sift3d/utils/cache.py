"""Persistent XLA compilation cache.

Multi-octave extraction compiles one program per octave shape; on remote-
compile TPU setups that dominates cold-start latency. The persistent cache
makes every run after the first start hot. Called by the CLIs and bench.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "SIFT3D_COMPILE_CACHE", os.path.expanduser("~/.cache/sift3d_xla")
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # cache flags unavailable: run without persistence
