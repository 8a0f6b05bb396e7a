"""JAX runtime configuration helpers."""

from __future__ import annotations

import os


def enable_persistent_cache() -> None:
    """Enable XLA persistent compilation cache so repeated pipeline runs skip
    the (20-150s) first-compile cost."""
    import jax
    cache_dir = os.environ.get(
        "CLIQUE_TPU_XLA_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "clique_tpu_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
