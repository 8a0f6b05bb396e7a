"""Collapse package: hierarchical tag correction + spill shards.

Re-exports resolve lazily so that jax-free consumers (worker processes in
the host-parallel collapse; see collapse/workers.py) can import shard and
ingestion submodules without pulling in the device kernels (correct.py ->
distance.py -> jax).
"""

_EXPORTS = {
    "correct_degenerate": "clique_tpu.collapse.correct",
    "correct_known_hamming": "clique_tpu.collapse.correct",
    "correct_known_levenshtein": "clique_tpu.collapse.correct",
    "ShardReader": "clique_tpu.collapse.shards",
    "ShardWriter": "clique_tpu.collapse.shards",
    "iter_sorted_groups": "clique_tpu.collapse.shards",
}

__all__ = list(_EXPORTS)


def __getattr__(name):
    mod = _EXPORTS.get(name)
    if mod is None:
        raise AttributeError(name)
    import importlib

    return getattr(importlib.import_module(mod), name)
