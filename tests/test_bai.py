"""BAI index writer + indexed fetch: region queries through our .bai must
return exactly the overlapping records - the random-access contract the
reference collapse input requires (collapse.rs:437-491, bai at :465).
Also pins the BGZF BSIZE field to spec (total-1): htslib-style readers
seek by it."""

import struct

import numpy as np

from clique_tpu.io.sam import (
    BamReader,
    BamWriter,
    SamRecord,
    build_bai,
    write_bai,
)

RNG = np.random.default_rng(55)
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def make_bam(path, n_per_ref=40, ref_len=100000):
    refs = [("chrA", ref_len), ("chrB", ref_len)]
    positions = {}
    with BamWriter(str(path), refs) as w:
        for ref, _l in refs:
            pos = 1
            positions[ref] = []
            for i in range(n_per_ref):
                seq = RNG.choice(BASES, 50).tobytes()
                w.write(SamRecord(
                    name=f"{ref}_r{i}", flag=0, reference_name=ref,
                    pos=pos, mapq=60, cigar=[(50, "M")], seq=seq,
                    qual=b"H" * 50, tags={"rc": "1"}))
                positions[ref].append(pos - 1)
                pos += ref_len // (n_per_ref + 1)
    return refs, positions


def test_bgzf_bsize_is_spec_compliant(tmp_path):
    bam = tmp_path / "spec.bam"
    make_bam(bam, n_per_ref=3)
    raw = open(bam, "rb").read()
    off = 0
    n_blocks = 0
    while off < len(raw):
        xlen = struct.unpack_from("<H", raw, off + 10)[0]
        extra = raw[off + 12:off + 12 + xlen]
        o = 0
        bsize = None
        while o + 4 <= len(extra):
            si1, si2, slen = struct.unpack_from("<BBH", extra, o)
            if si1 == 66 and si2 == 67:
                bsize = struct.unpack_from("<H", extra, o + 4)[0] + 1
            o += 4 + slen
        assert bsize is not None
        off += bsize          # BSIZE-1 stored -> walking lands on blocks
        n_blocks += 1
    assert off == len(raw)    # blocks tile the file exactly
    assert n_blocks >= 2      # data + EOF marker


def test_bai_fetch_regions(tmp_path):
    bam = tmp_path / "indexed.bam"
    _refs, positions = make_bam(bam)
    bai = write_bai(str(bam))
    assert bai.endswith(".bai")

    with BamReader(str(bam)) as r:
        # whole-reference fetch
        names = [rec.name for rec in r.fetch("chrA")]
        assert len(names) == 40
        assert all(n.startswith("chrA_") for n in names)
        # narrow window: exactly the overlapping records
        got = [rec.name for rec in r.fetch("chrB", 0, 30000)]
        expected = [f"chrB_r{i}" for i, p in enumerate(positions["chrB"])
                    if p < 30000]
        assert got == expected
        assert 0 < len(got) < 40
        # a window in the middle
        got2 = [rec.name for rec in r.fetch("chrA", 50000, 60000)]
        expected2 = [f"chrA_r{i}" for i, p in enumerate(positions["chrA"])
                     if p < 60000 and p + 50 > 50000]
        assert got2 == expected2 and got2


def test_bai_unmapped_counted(tmp_path):
    bam = tmp_path / "u.bam"
    refs = [("chrA", 1000)]
    with BamWriter(str(bam), refs) as w:
        w.write(SamRecord(name="m", flag=0, reference_name="chrA", pos=1,
                          mapq=60, cigar=[(10, "M")],
                          seq=b"ACGTACGTAC", qual=b"H" * 10, tags={}))
        w.write(SamRecord(name="u", flag=0x4, reference_name="",
                          pos=0, mapq=0, cigar=[], seq=b"ACGT",
                          qual=b"HHHH", tags={}))
    idx = build_bai(str(bam))
    (n_no_coor,) = struct.unpack("<Q", idx[-8:])
    assert n_no_coor == 1
    write_bai(str(bam))
    with BamReader(str(bam)) as r:
        assert [rec.name for rec in r.fetch("chrA")] == ["m"]


def test_bai_multi_block_bam(tmp_path):
    """Records spanning many BGZF blocks (> 64KB of data) still fetch
    correctly - virtual offsets cross block boundaries."""
    bam = tmp_path / "big.bam"
    refs = [("chrA", 10_000_000)]
    step = 10_000_000 // 1001
    with BamWriter(str(bam), refs) as w:
        for i in range(1000):
            seq = RNG.choice(BASES, 120).tobytes()
            w.write(SamRecord(
                name=f"r{i}", flag=0, reference_name="chrA",
                pos=1 + i * step, mapq=60, cigar=[(120, "M")], seq=seq,
                qual=b"H" * 120, tags={"rc": "1", "ar": "x" * 40}))
    write_bai(str(bam))
    with BamReader(str(bam)) as r:
        lo, hi = 400 * step, 600 * step
        got = [rec.name for rec in r.fetch("chrA", lo, hi)]
    expected = [f"r{i}" for i in range(1000)
                if i * step < hi and i * step + 120 > lo]
    assert got == expected and len(got) > 100
