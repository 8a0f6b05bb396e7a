#!/usr/bin/env bash
# Rust-parity harness (VERDICT r3 item 7): given a Rust toolchain, build
# the reference binary from /root/reference/rust_cmd, run its align and
# collapse on the vendored golden inputs, run OUR chain on the same
# inputs, and compare record-level output (rust_parity_compare.py:
# canonical fields + sorted tags; BGZF framing / @PG lines / tag order
# excluded — see that file's header for why).
#
# This environment ships no cargo and has zero egress (the reference's
# git dependencies cannot be fetched), so the script SKIPS cleanly here;
# the moment any environment provides `cargo` + crates, one command
# closes the bit-for-bit clause:
#
#   tools/rust_parity.sh [REFERENCE_DIR] [WORKDIR]
#
# Reference CLI being driven: main.rs:135-200 (clique align / collapse).
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
REF="${1:-/root/reference}"
WORK="${2:-$(mktemp -d /tmp/rust_parity.XXXXXX)}"
GOLDEN="$REPO/tests/data/golden"

if ! command -v cargo >/dev/null 2>&1; then
    echo "SKIP: no cargo on PATH — install a Rust toolchain to run the" \
         "reference build (this box has none; documented limitation)."
    exit 0
fi
if [ ! -f "$REF/rust_cmd/Cargo.toml" ]; then
    echo "SKIP: reference rust_cmd not found under $REF"
    exit 0
fi

echo "[1/6] building reference binary (target dir: $WORK/target)"
# the reference mount is read-only: build entirely out-of-tree
CARGO_TARGET_DIR="$WORK/target" cargo build --release \
    --manifest-path "$REF/rust_cmd/Cargo.toml"
CLIQUE="$WORK/target/release/clique"

echo "[2/6] materializing the golden layout"
python - "$GOLDEN" "$WORK" <<'EOF'
import os, sys
golden, work = sys.argv[1], sys.argv[2]
tpl = open(os.path.join(golden, "layout.yaml.in")).read()
open(os.path.join(work, "layout.yaml"), "w").write(
    tpl.replace("@ALLOWLIST@", os.path.join(golden, "allowlist.txt")))
EOF

echo "[3/6] reference align + collapse"
"$CLIQUE" align \
    --read-structure "$WORK/layout.yaml" \
    --read1 "$GOLDEN/reads.fastq.gz" \
    --output-bam-file "$WORK/ref_aligned.bam" \
    --threads 1
# reference collapse requires an indexed BAM (collapse.rs:465); build
# the .bai with our own indexer
python -c "
import sys; sys.path.insert(0, '$REPO')
from clique_tpu.io.sam import write_bai
write_bai('$WORK/ref_aligned.bam')"
"$CLIQUE" collapse \
    --read-structure "$WORK/layout.yaml" \
    --input-bam-file "$WORK/ref_aligned.bam" \
    --output-bam-file "$WORK/ref_collapsed.bam" \
    --temp-dir "$WORK" \
    --threads 1

echo "[4/6] our align + collapse (CPU backend)"
env PYTHONPATH="$REPO" JAX_PLATFORMS=cpu python -m clique_tpu.cli align \
    --read-structure "$WORK/layout.yaml" \
    --read1 "$GOLDEN/reads.fastq.gz" \
    --output-bam-file "$WORK/our_aligned.bam"
env PYTHONPATH="$REPO" JAX_PLATFORMS=cpu python -m clique_tpu.cli collapse \
    --read-structure "$WORK/layout.yaml" \
    --input-bam-file "$WORK/our_aligned.bam" \
    --output-bam-file "$WORK/our_collapsed.bam"

echo "[5/6] align parity (record order is deterministic in both)"
python "$REPO/tools/rust_parity_compare.py" \
    "$WORK/our_aligned.bam" "$WORK/ref_aligned.bam"

echo "[6/6] collapse parity (sorted: the reference's rayon consensus"
echo "      scope does not pin cross-group write order)"
python "$REPO/tools/rust_parity_compare.py" --sort \
    "$WORK/our_collapsed.bam" "$WORK/ref_collapsed.bam"

echo "RUST PARITY: all comparisons passed (work dir kept: $WORK)"
