"""Parity tests: device batched DP (align/batch.py) vs the exact host golden
model (align/cpu.py), cell-decision for cell-decision.

The device path must reproduce the reference engine's alignments exactly:
same aligned strings, same CIGAR, same score - across random sequences,
mixed-length batches, wildcard references, and banded fills.
"""

import numpy as np
import pytest

from clique_tpu.align.batch import (
    align_batch_device,
    ops_to_alignment,
    pad_batch,
    scoring_to_params,
)
from clique_tpu.align.cpu import affine_align
from clique_tpu.align.scoring import AffineScoring

RNG = np.random.default_rng(42)
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def random_seq(n, rng=RNG):
    return rng.choice(BASES, size=n).tobytes()


def mutate(seq, rng=RNG, sub=0.1, indel=0.05):
    out = bytearray()
    for b in seq:
        r = rng.random()
        if r < indel / 2:
            continue  # deletion
        if r < indel:
            out.append(rng.choice(BASES))  # insertion before
        if rng.random() < sub:
            out.append(rng.choice(BASES))
        else:
            out.append(b)
    return bytes(out)


def run_device(pairs, scoring, bandwidth=None, local=False):
    refs, reads = zip(*pairs)
    refs_arr, ref_lens = pad_batch(list(refs))
    reads_arr, read_lens = pad_batch(list(reads))
    centers = None
    if bandwidth is None:
        bw = np.maximum(ref_lens, read_lens).astype(np.int32)
    else:
        from clique_tpu.align.batch import band_centers_f64

        bw = np.full(len(pairs), bandwidth, dtype=np.int32)
        centers = band_centers_f64(ref_lens, read_lens,
                                   refs_arr.shape[1] + 1)
    result, _tb = align_batch_device(
        refs_arr, reads_arr, ref_lens, read_lens, bw,
        scoring_to_params(scoring),
        n1=refs_arr.shape[1] + 1, n2=reads_arr.shape[1] + 1, local=local,
        band_centers=centers)
    return result


def assert_parity(pairs, scoring, bandwidth=None):
    res = run_device(pairs, scoring, bandwidth)
    ops = np.asarray(res.ops)
    n_ops = np.asarray(res.n_ops)
    scores = np.asarray(res.score)
    for i, (ref, read) in enumerate(pairs):
        golden = affine_align(ref, read, scoring, bandwidth=bandwidth)
        a1, a2, cigar = ops_to_alignment(ops[i], int(n_ops[i]), ref, read)
        assert a1 == golden.reference_aligned, (
            f"pair {i} ref:\n dev {a1}\n gold {golden.reference_aligned}")
        assert a2 == golden.read_aligned, (
            f"pair {i} read:\n dev {a2}\n gold {golden.read_aligned}")
        assert cigar == golden.cigar
        assert scores[i] == pytest.approx(golden.score, abs=0), (
            f"pair {i} score dev={scores[i]} gold={golden.score}")


def test_parity_simple():
    assert_parity([(b"AAAA", b"AATAA")], AffineScoring(6, -6, 8, -10, -10, 1.0))


def test_parity_identical():
    s = b"ACGTACGTACGTACGT"
    assert_parity([(s, s)], AffineScoring.default_dna())


def test_parity_wildcard_reference():
    ref = b"AAAAAAAA############################AGATCGGAAGAGCGTCGTGTAGGGAAAGA"
    read = b"AAAAAAAAAAAAAAAAAAAAAAAAATATCTCGTTTAATTGACTCTGAAATCAAGATCGGAAGAGCGTCGTGTAGGGAAAGA"
    assert_parity([(ref, read)], AffineScoring(6, -6, 5, -10, -10, 1.0))


def test_parity_terminal_gap_multiplier():
    # default_dna has fgm=0.5 which exercises the terminal row/col discounts
    ref = b"TTAAGCAGTGGTATCAACGCAGAGTACGCC"
    read = b"TTAAGCAGTGGTATCAACGCAG"
    assert_parity([(ref, read)], AffineScoring.default_dna())


@pytest.mark.parametrize("scoring", [
    AffineScoring.default_dna(),
    AffineScoring.aligner_default(),
    AffineScoring.merge_default(),
    AffineScoring.distance_dna(),
])
def test_parity_random_batch(scoring):
    pairs = []
    for _ in range(12):
        n = int(RNG.integers(10, 120))
        ref = random_seq(n)
        read = mutate(ref)
        if len(read) == 0:
            read = b"A"
        pairs.append((ref, read))
    assert_parity(pairs, scoring)


def test_parity_mixed_lengths_in_one_batch():
    scoring = AffineScoring.aligner_default()
    pairs = []
    for n in (8, 33, 57, 96, 120):
        ref = random_seq(n)
        pairs.append((ref, mutate(ref)))
    assert_parity(pairs, scoring)


def test_parity_banded():
    scoring = AffineScoring.aligner_default()
    ref = random_seq(80)
    read = mutate(ref, sub=0.05, indel=0.02)
    assert_parity([(ref, read)], scoring, bandwidth=20)


def test_parity_banded_f64_center_truncation():
    """len1=48, len2=146: the reference's f64 band center at x=1 truncates
    to 2 although the exact quotient 147/49 is 3 (alignment_matrix.rs:414);
    band_centers_f64 must reproduce that (advisor finding)."""
    from clique_tpu.align.batch import band_centers_f64

    centers = band_centers_f64(np.array([48]), np.array([146]), 49)
    assert centers[0, 1] == 2        # f64 double-rounding, not exact 3
    scoring = AffineScoring.aligner_default()
    ref = random_seq(48)
    read = random_seq(146)
    assert_parity([(ref, read)], scoring, bandwidth=3)


def test_parity_read_longer_than_ref():
    scoring = AffineScoring.aligner_default()
    ref = random_seq(40)
    read = random_seq(25) + mutate(ref) + random_seq(25)
    assert_parity([(ref, read)], scoring)


def test_parity_with_n_bases():
    scoring = AffineScoring.default_dna()
    ref = b"ACGTNNNNNNNNNNACGTACGT"
    read = b"ACGTGGCCGGCCGGACGTACGT"
    assert_parity([(ref, read)], scoring)


def test_batch_aligner_bandwidth_knob():
    """BatchAligner(bandwidth=k) routes through the banded XLA fill with
    f64 band centers: outputs equal the golden banded affine_align
    (perform_affine_alignment_bandwidth, alignment_matrix.rs:376-425).
    The pipeline-level half of SURVEY row 9 (the driver previously always
    passed a full band)."""
    from clique_tpu.align.pipeline import BatchAligner

    scoring = AffineScoring.aligner_default()
    pairs = []
    for n in (40, 80, 120):
        ref = random_seq(n)
        pairs.append((ref, mutate(ref, sub=0.05, indel=0.02)))
    aligner = BatchAligner(scoring, batch_size=8, bandwidth=16)
    out = aligner.align_pairs([p[0] for p in pairs], [p[1] for p in pairs])
    for (ref, read), (a1, a2, cigar, score) in zip(pairs, out):
        golden = affine_align(ref, read, scoring, bandwidth=16)
        assert a1 == golden.reference_aligned
        assert a2 == golden.read_aligned
        assert score == golden.score
