"""Persistent XLA compilation cache.

The search workload compiles one program per (bucket, padded-pop) shape;
each TPU compile costs tens of seconds while a whole population's training
runs in ~15s. Enabling JAX's persistent compilation cache makes every
program a one-time cost across processes AND rounds — the shape-bucket
design (engine/evaluator.py) keeps the universe of programs small, so the
cache converges after the first generation of the first run.
"""

from __future__ import annotations

import hashlib
import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)
_enabled = False


def _host_cpu_fingerprint() -> str:
    """Stable fingerprint of the host CPU's ISA feature set.

    XLA:CPU persists AOT-compiled machine code; an entry compiled on a host
    with a different feature set (e.g. AMX/AVX-512 variants) loads with a
    'machine type mismatch' warning and can produce subtly different
    numerics or SIGILL. Keying the CPU cache by the feature set makes stale
    cross-host entries unreachable instead of silently wrong.

    Note: XLA's load-time warning itself is NOT evidence of a cross-host
    entry — reloading an entry on the very machine that compiled it still
    prints 'Target machine feature +prefer-no-scatter/+prefer-no-gather is
    not supported on the host machine', because those LLVM tuning
    pseudo-features are embedded at compile time but never listed by the
    load-time host-feature probe (verified empirically: fresh cache, same
    box, second process warns). Treat the warning as noise; this
    fingerprint is what actually guards against foreign entries."""
    try:
        parts = []
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip()
                # flags alone are not enough: XLA's AOT entries also embed
                # LLVM tuning pseudo-features (+prefer-no-gather, ...) chosen
                # from the cpuid family/model, so two hosts with identical
                # flags lines can still mismatch ("machine type mismatch"
                # load warnings). Key on the full CPU identity.
                if key in ("flags", "model name", "cpu family", "model",
                           "stepping"):
                    parts.append(
                        f"{key}={' '.join(sorted(line.split(':', 1)[1].split()))}"
                    )
                if key == "processor" and parts:
                    break  # first core's block is enough
        if parts:
            return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha256(platform.processor().encode()).hexdigest()[:12]


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Idempotently enable the JAX persistent compilation cache.

    TPU executables are portable serialized programs and live at the cache
    root; the CPU backend (tests, dryruns) gets a host-keyed subdirectory
    (see _host_cpu_fingerprint)."""
    global _enabled
    import jax

    path = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR", _DEFAULT_DIR)
    if not _enabled and jax.default_backend() == "cpu":
        path = os.path.join(path, f"cpu-{_host_cpu_fingerprint()}")
    if not _enabled:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    return path
