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
    Call before the first jit compilation. Returns the cache dir.

    Entries committed under `.jax_cache_seed/` (the production benchmark
    shapes, ~1.7 min compile each over the axon tunnel) are hard-linked
    into the working cache first, so a fresh clone's first `bench.py`
    call deserializes instead of compiling."""
    import jax

    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if path is None:
        path = os.environ.get("RLAP_TPU_COMPILE_CACHE",
                              os.path.join(root, ".jax_cache"))
    os.makedirs(path, exist_ok=True)
    seed = os.path.join(root, ".jax_cache_seed")
    if os.path.isdir(seed) and os.path.abspath(seed) != os.path.abspath(path):
        import shutil
        for name in os.listdir(seed):
            src = os.path.join(seed, name)
            dst = os.path.join(path, name)
            # copy (not hard-link): the working cache may be rewritten in
            # place by jax or truncated by tools, and a shared inode would
            # silently mutate the committed seed entry
            if os.path.isfile(src) and not os.path.exists(dst):
                try:
                    shutil.copy2(src, dst)
                except OSError as e:
                    # a lost seed copy silently costs minutes of compile —
                    # make the miss diagnosable
                    import warnings
                    warnings.warn(
                        f"compile-cache seed entry {name!r} failed to copy "
                        f"({e}); first call will compile from scratch")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    # The default "all" embeds XLA-side cache file paths (derived from the
    # cache dir) into CompileOptions, which leaks into the cache KEY — the
    # same program hashed under two cache dirs (or a relocated checkout)
    # gets different keys and always misses. Measured: serialized
    # CompileOptions differ by exactly the dir path; with "none" they are
    # byte-identical across dirs and processes, making the committed seed
    # entries (.jax_cache_seed/) portable.
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    return path
