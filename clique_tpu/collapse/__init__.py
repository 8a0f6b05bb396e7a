from clique_tpu.collapse.correct import (
    correct_degenerate,
    correct_known_hamming,
    correct_known_levenshtein,
)
from clique_tpu.collapse.shards import (
    ShardReader,
    ShardWriter,
    iter_sorted_groups,
)

__all__ = [
    "correct_degenerate",
    "correct_known_hamming",
    "correct_known_levenshtein",
    "ShardReader",
    "ShardWriter",
    "iter_sorted_groups",
]
