"""Persistent XLA compilation cache.

The search workload compiles one program per (bucket, padded-pop) shape;
each TPU compile costs tens of seconds while a whole population's training
runs in ~15s. Enabling JAX's persistent compilation cache makes every
program a one-time cost across processes AND rounds — the shape-bucket
design (engine/evaluator.py) keeps the universe of programs small, so the
cache converges after the first generation of the first run.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)
_enabled = False


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Idempotently enable the JAX persistent compilation cache."""
    global _enabled
    import jax

    path = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR", _DEFAULT_DIR)
    if not _enabled:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    return path
