"""Persistent XLA compilation cache helper.

Serving and benchmarking recompile identical programs on every process
start; enabling the JAX persistent cache makes warm starts near-instant
(important when compilation is remoted over a slow link).
"""

from __future__ import annotations

import os
from typing import Optional

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_persistent_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    import jax

    cache_dir = cache_dir or os.environ.get("SMER_JAX_CACHE", _DEFAULT_DIR)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return cache_dir
    except Exception:
        return None
