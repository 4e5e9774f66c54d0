"""Persistent XLA compilation cache setup.

On tunneled TPU backends a single compile costs 30-300 s (measured: a
trivial jitted matmul compiled in 295 s cold and 0.58 s from a warm cache
in a fresh process). The reference pays no analogous cost (eager torch), so
every cold compile is pure overhead against its wall-clock numbers. JAX's
persistent cache keys on the serialized HLO + compile options, so reuse is
sound across processes and runs.

Called once at process start by the benchmark harness / bench scripts.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)

_enabled_path: str | None = None


def maybe_enable(cache_dir: str | None = None) -> str | None:
    """Enable the persistent compilation cache (idempotent).

    ``cache_dir`` defaults to ``<repo>/.jax_cache``; set the env var
    ``VITSOM_NO_COMPILATION_CACHE=1`` to disable (e.g. to measure true
    cold-start wall-clock). Returns the directory actually in effect —
    on repeat calls that is the FIRST enabled path (a later call with a
    different ``cache_dir`` warns and keeps the original).
    """
    global _enabled_path
    if _enabled_path is not None:
        if cache_dir is not None and cache_dir != _enabled_path:
            import warnings

            warnings.warn(
                f"compilation cache already enabled at {_enabled_path}; "
                f"ignoring new cache_dir {cache_dir}"
            )
        return _enabled_path
    if os.environ.get("VITSOM_NO_COMPILATION_CACHE"):
        return None
    import jax

    path = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR") or DEFAULT_CACHE_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything that takes >=1s to compile (every real program here)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _enabled_path = path
    return path
