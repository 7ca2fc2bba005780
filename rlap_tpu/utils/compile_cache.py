"""Persistent XLA compilation cache setup.

First-compile of the elimination while-loop costs 60-100s over the axon
tunnel; the persistent cache turns repeat runs (including the driver's
fresh-process benchmark run) into a deserialize-and-go. Verified to work
with the remote axon backend (an 8.6MB executable round-tripped across
processes).
"""

from __future__ import annotations

import os


def setup_compilation_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at a repo-local directory.
    Call before the first jit compilation. Returns the cache dir."""
    import jax

    if path is None:
        root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        path = os.environ.get("RLAP_TPU_COMPILE_CACHE",
                              os.path.join(root, ".jax_cache"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
