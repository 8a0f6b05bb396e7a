"""Golden-pipeline regression pin (VERDICT r2 item 8).

Re-runs the DEFAULT align -> collapse -> call chain on the frozen inputs in
tests/data/golden/ and asserts byte-for-byte identity with the vendored
artifacts: inflated BAM payloads (header + every record byte), the
deterministic tag dumps, and the allele table. Any drift in alignment,
extraction, correction, consensus, BAM encoding, or event calling fails
here (BASELINE "bit-for-bit" clause). Intentional behavior changes must
regenerate via tools/make_golden.py and say so in the commit message.
"""

import gzip
import importlib.util
import os
import struct

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(ROOT, "tests", "data", "golden")


def _load_make_golden():
    spec = importlib.util.spec_from_file_location(
        "make_golden", os.path.join(ROOT, "tools", "make_golden.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _inflate_bgzf(path):
    """Concatenated decompressed payload of every BGZF block: the BAM
    bytes independent of block framing."""
    out = []
    with open(path, "rb") as fh:
        raw = fh.read()
    p = 0
    while p < len(raw):
        assert raw[p:p + 4] == b"\x1f\x8b\x08\x04", "not a BGZF block"
        xlen = struct.unpack_from("<H", raw, p + 10)[0]
        xp, bsize = p + 12, None
        while xp < p + 12 + xlen:
            si1, si2, slen = struct.unpack_from("<BBH", raw, xp)
            if si1 == 66 and si2 == 67:
                bsize = struct.unpack_from("<H", raw, xp + 4)[0] + 1
            xp += 4 + slen
        assert bsize is not None
        block = raw[p:p + bsize]
        out.append(gzip.decompress(block))
        p += bsize
    return b"".join(out)


@pytest.fixture(scope="module")
def pipeline_outputs(tmp_path_factory):
    mg = _load_make_golden()
    workdir = str(tmp_path_factory.mktemp("golden_run"))
    aligned, collapsed, alleles = mg.run_pipeline(workdir)
    return mg, aligned, collapsed, alleles


@pytest.mark.parametrize("name", ["aligned.bam", "collapsed.bam"])
def test_bam_payload_pinned(pipeline_outputs, name):
    _, aligned, collapsed, _ = pipeline_outputs
    fresh = aligned if name == "aligned.bam" else collapsed
    got = _inflate_bgzf(fresh)
    want = _inflate_bgzf(os.path.join(GOLDEN, name))
    assert got == want, f"{name} BAM payload drifted from the golden pin"


@pytest.mark.parametrize("name", ["aligned.bam", "collapsed.bam"])
def test_tag_dump_pinned(pipeline_outputs, name, tmp_path):
    mg, aligned, collapsed, _ = pipeline_outputs
    fresh = aligned if name == "aligned.bam" else collapsed
    out = tmp_path / (name + ".tags.tsv")
    mg.dump_tags(fresh, str(out))
    with open(os.path.join(GOLDEN, name + ".tags.tsv")) as fh:
        want = fh.read()
    assert out.read_text() == want, f"{name} tag dump drifted"


@pytest.mark.parametrize("engine", ["wfa", "convex"])
def test_engine_bam_pinned(engine, tmp_path):
    """Per-engine byte pins: the wavefront engines' aligned BAMs must
    stay byte-stable too (CIGARs, scores, extracted tags)."""
    mg = _load_make_golden()
    fresh = mg.run_engine(str(tmp_path), engine)
    got = _inflate_bgzf(fresh)
    want = _inflate_bgzf(os.path.join(GOLDEN, f"aligned_{engine}.bam"))
    assert got == want, f"{engine} engine BAM payload drifted"


def test_alleles_pinned(pipeline_outputs):
    _, _, _, alleles = pipeline_outputs
    with open(alleles) as fh:
        got = fh.read()
    with open(os.path.join(GOLDEN, "alleles.tsv")) as fh:
        want = fh.read()
    assert got == want, "allele table drifted"


GOLDEN_PE = os.path.join(ROOT, "tests", "data", "golden_pe")


@pytest.fixture(scope="module")
def pe_outputs(tmp_path_factory):
    mg = _load_make_golden()
    workdir = str(tmp_path_factory.mktemp("golden_pe_run"))
    aligned, collapsed, alleles = mg.run_pe_pipeline(workdir)
    return mg, aligned, collapsed, alleles


@pytest.mark.parametrize("name", ["aligned.bam", "collapsed.bam"])
def test_pe_bam_payload_pinned(pe_outputs, name):
    """Paired-end merge (merger.rs:348 overlap-consensus path) byte pin:
    the Align merge strategy's full chain output must stay byte-stable
    (VERDICT r3 item 8)."""
    _, aligned, collapsed, _ = pe_outputs
    fresh = aligned if name == "aligned.bam" else collapsed
    got = _inflate_bgzf(fresh)
    want = _inflate_bgzf(os.path.join(GOLDEN_PE, name))
    assert got == want, f"golden_pe {name} payload drifted"


def test_pe_alleles_pinned(pe_outputs):
    _, _, _, alleles = pe_outputs
    with open(alleles) as fh:
        got = fh.read()
    with open(os.path.join(GOLDEN_PE, "alleles.tsv")) as fh:
        want = fh.read()
    assert got == want, "golden_pe allele table drifted"


def test_pe_inputs_frozen(tmp_path):
    mg = _load_make_golden()
    mg.write_pe_inputs(str(tmp_path))
    for name in ("reads1.fastq.gz", "reads2.fastq.gz", "allowlist.txt",
                 "layout.yaml.in"):
        with open(os.path.join(GOLDEN_PE, name), "rb") as fh:
            want = fh.read()
        assert (tmp_path / name).read_bytes() == want, \
            f"golden_pe input generator drifted for {name}"


GOLDEN_ML = os.path.join(ROOT, "tests", "data", "golden_ml")


@pytest.fixture(scope="module")
def ml_outputs(tmp_path_factory):
    mg = _load_make_golden()
    workdir = str(tmp_path_factory.mktemp("golden_ml_run"))
    aligned, collapsed, _none = mg.run_ml_pipeline(workdir)
    return mg, aligned, collapsed


@pytest.mark.parametrize("name", ["aligned.bam", "collapsed.bam"])
def test_ml_bam_payload_pinned(ml_outputs, name):
    """Mouse-lineage 3-level legacy-schema byte pin (VERDICT r4 item 7):
    the maryam_fwd_both.yaml-shaped config (older YAML schema, bare
    READ1/READ2, ConcatenateBothForward, KnownTag-levenshtein 16bp cell
    + Degenerate 12bp UMI + Degenerate 12bp static id) through the whole
    chain must stay byte-stable."""
    _, aligned, collapsed = ml_outputs
    fresh = aligned if name == "aligned.bam" else collapsed
    got = _inflate_bgzf(fresh)
    want = _inflate_bgzf(os.path.join(GOLDEN_ML, name))
    assert got == want, f"golden_ml {name} payload drifted"


def test_ml_tag_dump_pinned(ml_outputs, tmp_path):
    mg, _aligned, collapsed = ml_outputs
    out = tmp_path / "collapsed.tags.tsv"
    mg.dump_tags(collapsed, str(out))
    with open(os.path.join(GOLDEN_ML, "collapsed.bam.tags.tsv")) as fh:
        want = fh.read()
    assert out.read_text() == want, "golden_ml collapsed tag dump drifted"
    # structural assertion the dataset was built for: all three closers
    # landed, leaving exactly 12 rc=8 consensus groups
    assert want.count("rc=8") == 12 and want.count("\n") == 12


def test_ml_inputs_frozen(tmp_path):
    mg = _load_make_golden()
    mg.write_ml_inputs(str(tmp_path))
    for name in ("reads1.fastq.gz", "reads2.fastq.gz", "allowlist.txt",
                 "layout.yaml.in"):
        with open(os.path.join(GOLDEN_ML, name), "rb") as fh:
            want = fh.read()
        assert (tmp_path / name).read_bytes() == want, \
            f"golden_ml input generator drifted for {name}"


def test_inversion_pinned(tmp_path):
    """Inversion-path byte pin on the big-inversion fixture
    (linked_alignment.rs:619-689). Pinned at the alignment level, not as
    BAM — the reference panics converting InversionOpen/Close to SAM ops
    (alignment_matrix.rs:103-104), so no BAM form exists."""
    mg = _load_make_golden()
    fresh = mg.run_inversion(str(tmp_path))
    with open(fresh) as fh:
        got = fh.read()
    with open(os.path.join(GOLDEN, "inversion.tsv")) as fh:
        want = fh.read()
    assert got == want, "inversion alignment drifted from the golden pin"


def test_golden_inputs_frozen(tmp_path):
    """The generator's input-minting is deterministic and matches the
    vendored inputs — guards against silently regenerating a different
    dataset. Generates into tmp_path and byte-compares (never rewrites
    the vendored fixtures: a drifting generator must fail loudly, not
    leave a dirty tree whose inputs no longer match the pinned outputs)."""
    mg = _load_make_golden()
    mg.write_inputs(str(tmp_path))
    for name in ("reads.fastq.gz", "allowlist.txt", "layout.yaml.in"):
        with open(os.path.join(GOLDEN, name), "rb") as fh:
            want = fh.read()
        assert (tmp_path / name).read_bytes() == want, \
            f"golden input generator drifted for {name}"
