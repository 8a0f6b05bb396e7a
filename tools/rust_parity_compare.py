#!/usr/bin/env python
"""Canonical BAM comparison for the Rust-parity harness.

Dumps each BAM's alignment records to a canonical TSV form and diffs
them. Canonical = framing-independent: BGZF block boundaries, @PG/@CO
header lines, and intra-record tag ORDER are ignored (noodles writes
tags from a HashMap, so its order is unstable across runs —
SURVEY "Hard parts" item 5); everything else — read name, reference,
position, CIGAR, sequence, quals, and every tag's value — must match
exactly.

Usage: rust_parity_compare.py OURS.bam THEIRS.bam [--sort]
  --sort  compare as multisets ordered by (reference, read name) —
          needed for collapse outputs, where the reference's rayon
          consensus scope (consensus_builders.rs:91-96) does not pin
          cross-group write order.

Exit 0 on match; 1 with the first differing records on stderr.
"""
import argparse
import sys

sys.path.insert(0, __import__("os").path.join(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__)),
    ".."))

from clique_tpu.io.sam import BamReader  # noqa: E402


def canonical_lines(path: str):
    def s(x):
        return x.decode() if isinstance(x, (bytes, bytearray)) else str(x)

    lines = []
    with BamReader(path) as rd:
        for rec in rd:
            allt = dict(rec.tags)
            allt.update({k: v for k, (_t, v) in rec.typed_tags.items()})
            tags = ",".join(f"{k}={allt[k]}" for k in sorted(allt))
            lines.append("\t".join([
                rec.name, rec.reference_name or "*", str(rec.pos),
                rec.cigar_string, s(rec.seq) or "*", s(rec.qual) or "*",
                str(rec.flag), tags,
            ]))
    return lines


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("ours")
    ap.add_argument("theirs")
    ap.add_argument("--sort", action="store_true")
    ap.add_argument("--max-report", type=int, default=10)
    args = ap.parse_args()

    a = canonical_lines(args.ours)
    b = canonical_lines(args.theirs)
    if args.sort:
        a.sort()
        b.sort()
    if a == b:
        print(f"PARITY OK: {len(a)} records identical "
              f"({args.ours} vs {args.theirs})")
        return 0
    print(f"PARITY MISMATCH: {len(a)} vs {len(b)} records",
          file=sys.stderr)
    import difflib
    shown = 0
    for line in difflib.unified_diff(a, b, fromfile=args.ours,
                                     tofile=args.theirs, lineterm=""):
        print(line, file=sys.stderr)
        shown += 1
        if shown >= args.max_report * 4:
            print("... (truncated)", file=sys.stderr)
            break
    return 1


if __name__ == "__main__":
    sys.exit(main())
