"""Persistent XLA compilation cache.

First compiles of the full EDTR graph run minutes on the axon tunnel; the
on-disk cache makes every subsequent process (tests, bench, driver runs) hit
warm. Call :func:`enable_compilation_cache` before the first jit.
"""

import os


def enable_compilation_cache(path: str = "/root/repo/.jax_cache") -> None:
    """Opt-in via EDTR_JAX_CACHE=1.

    WARNING: on the axon TPU backend the persistent cache can stall compiles
    of control-flow-heavy executables (observed: the detector graph hanging
    >20 min with the cache vs 17 s without). Keep it off unless measured.
    """
    if os.environ.get("EDTR_JAX_CACHE", "0") != "1":
        return
    import jax

    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax: flags absent
