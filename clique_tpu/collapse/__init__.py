from clique_tpu.collapse.correct import (
    correct_degenerate,
    correct_known_hamming,
    correct_known_levenshtein,
)

__all__ = [
    "correct_degenerate",
    "correct_known_hamming",
    "correct_known_levenshtein",
]
