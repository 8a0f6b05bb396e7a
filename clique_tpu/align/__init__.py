from clique_tpu.align.scoring import AffineScoring, InversionScoring, SimpleScoring
from clique_tpu.align.cpu import (
    AlignmentResult,
    affine_align,
    clean_and_find_next_best,
)

__all__ = [
    "AffineScoring",
    "InversionScoring",
    "SimpleScoring",
    "AlignmentResult",
    "affine_align",
    "clean_and_find_next_best",
]
