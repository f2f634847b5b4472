"""Process-level runtime setup shared by CLI entry points and benchmarks."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Persist XLA compilations across processes.

    Compile times dominate short CLI runs (minutes per jit over remote-compile
    links); the on-disk cache makes repeat invocations with the same shapes
    start in seconds.  Safe to call multiple times.
    """
    import jax

    cache_dir = path or os.environ.get("KB2E_COMPILATION_CACHE")
    if not cache_dir:
        # Opt-in only: the on-disk cache interacts badly with some
        # remote-compile PJRT backends (observed: indefinite stalls), so it is
        # never enabled implicitly.
        return
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimisation; never fail a run over it
