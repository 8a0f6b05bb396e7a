"""Multi-host collapse: the distributed version of the collapse pipeline.

The reference engine is single-node: its shardio external-memory sort
(/root/reference/rust_cmd/src/collapse.rs:468-469) is the boundary that
becomes cross-host communication at pod scale (SURVEY 2.11 P4/P5, BASELINE
north star: "UMI groups spanning hosts are merged via all-gather/psum
collectives before consensus"). This module wires that design end-to-end:

- every process ingests a deterministic slice of the input BAM (record
  chunks dealt round-robin);
- per correction level, tag counting is LOCAL; per-bin count dictionaries
  are exchanged through the shared filesystem (the all-to-all payload
  path, mirroring shardio's disk boundary), while bin-bucket histograms
  are psum-merged over the global device mesh (parallel/groupby.py) to
  assign each bin a deterministic owner balanced by load;
- each owner builds its bins' correction maps with the device kernels,
  publishes them, and every process applies the merged maps to its local
  reads — reads never move during correction (correction maps depend only
  on tag counts, so shipping counts beats shipping reads);
- before consensus, the one real read exchange: reads are spilled into
  hash-partitioned shards keyed by their final group key
  (collapse/shards.py — equal keys always share a shard id), shard ids
  are dealt to owners, and each owner consensus-collapses its shards;
- process 0 concatenates the per-owner record sets into the output BAM.

Synchronization uses jax.distributed + multihost_utils.sync_global_devices
(every barrier is a named collective over all hosts). Run one process per
host with identical arguments plus a distinct process_id; single-process
calls (num_processes=1) skip jax.distributed and reduce to the in-RAM
pipeline semantics. Output record MULTISET is identical to single-host
collapse(); record order follows shard order (grouping, not order, is the
contract — see shards.iter_sorted_groups).
"""

from __future__ import annotations

import logging
import os
import pickle
import time
from collections import Counter
from typing import Dict, List, Optional, Tuple

log = logging.getLogger(__name__)


def init_distributed(coordinator_address: Optional[str],
                     num_processes: int, process_id: int) -> None:
    """jax.distributed.initialize (idempotent): the collectives backbone
    for multi-host runs. On TPU pods the coordinator/process count come
    from the environment; for CPU-mesh tests they are passed explicitly."""
    import jax

    if num_processes <= 1:
        return
    if jax.distributed.is_initialized():
        return  # already initialized (e.g. by the launcher)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def _barrier(name: str, num_processes: int) -> None:
    if num_processes <= 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def global_mesh():
    """1-D 'data' mesh over every device of every process."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), axis_names=("data",))


def psum_histogram(mesh, local_hist) -> "np.ndarray":
    """Cross-process merge of per-bucket counts: each process contributes
    its local histogram row into a globally-sharded [n_devices, n_buckets]
    array; one jitted sum reduces over the sharded axis (XLA inserts the
    psum across hosts). Replicated result on every process."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_buckets = int(local_hist.shape[0])
    n_local = jax.local_device_count()
    local_rows = np.zeros((n_local, n_buckets), dtype=np.int32)
    local_rows[0] = local_hist
    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() > 1:
        garr = jax.make_array_from_process_local_data(sharding, local_rows)
    else:
        garr = jax.device_put(local_rows, sharding)

    @functools.partial(jax.jit, out_shardings=NamedSharding(mesh, P()))
    def reduce(rows):
        return jnp.sum(rows, axis=0)

    return np.asarray(reduce(garr))


# --- distributed align --------------------------------------------------------

def align_distributed(layout, rm, output_path: str, work_dir: str, *,
                      read1: str, read2: Optional[str] = None,
                      index1: Optional[str] = None,
                      index2: Optional[str] = None,
                      process_id: int = 0, num_processes: int = 1,
                      coordinator_address: Optional[str] = None,
                      **align_kwargs):
    """Multi-host align: the north-star first clause — "read batches stream
    data-parallel from FASTQ shards, one shard set per host" (SURVEY 2.11
    P1; the rayon fanout of alignment_functions.rs:90-93 scaled across
    processes).

    Every process calls this with identical arguments except process_id:
    each runs the full align_reads pipeline on its deterministic stripe of
    read chunks (align_reads read_shard) against replicated references,
    writing a part BAM in the shared work_dir; rank 0 merges the parts by
    raw BGZF-block append (io/sam.py:concat_bam_parts — header written
    once, record blocks concatenated, no recompression). Output record
    MULTISET equals single-process align_reads; record order follows
    (rank, stripe) order. output_path must be .bam. Returns AlignStats for
    the LOCAL slice."""
    from clique_tpu.align.pipeline import align_reads
    from clique_tpu.io.sam import concat_bam_parts

    if not str(output_path).endswith(".bam"):
        raise ValueError("distributed align writes BAM output only")
    init_distributed(coordinator_address, num_processes, process_id)
    os.makedirs(work_dir, exist_ok=True)
    t0 = time.time()
    part = os.path.join(work_dir, f"part.p{process_id}.bam")
    stats = align_reads(
        layout, rm, part, read1=read1, read2=read2, index1=index1,
        index2=index2,
        read_shard=(process_id, num_processes) if num_processes > 1
        else None,
        **align_kwargs)
    _barrier("align-parts", num_processes)
    if process_id == 0:
        references = [(r.name, len(r.sequence))
                      for r in rm.references.values()]
        nbytes = concat_bam_parts(
            output_path, references,
            [os.path.join(work_dir, f"part.p{p}.bam")
             for p in range(num_processes)])
        log.info("distributed align: %d processes, %d part bytes merged, "
                 "%.1fs", num_processes, nbytes, time.time() - t0)
    _barrier("align-done", num_processes)
    return stats


# --- distributed collapse -----------------------------------------------------

def _ingest_slice(input_bam: str, layout, rm, process_id: int,
                  num_processes: int, stats) -> Dict[str, List]:
    """Ingest record chunks i with i % num_processes == process_id.
    Deterministic disjoint cover of the input; each process decodes only
    its chunks (BGZF inflation of the shared stream is repeated per
    process — a per-host byte-range index removes that at pod scale)."""
    from clique_tpu.collapse.pipeline import _RefIngest
    from clique_tpu.collapse.workers import iter_record_chunks
    from clique_tpu.io.sam import decode_record_stream

    references, chunks = iter_record_chunks(input_bam)
    ingests = {name: _RefIngest(name, rm, layout)
               for name in layout.references}
    for i, chunk in enumerate(chunks):
        if i % num_processes != process_id:
            continue
        for rec in decode_record_stream(chunk, references,
                                        parse_tags=False):
            ing = ingests.get(rec.reference_name or "")
            if ing is None:
                continue
            stats.total_reads += 1
            if rec.flag & 0x100:
                stats.secondary += 1
                continue
            if rec.flag & 0x4:
                stats.unmapped += 1
                continue
            ing.ingest(rec, stats)
    return {name: ing.finish(stats) for name, ing in ingests.items()}


def _local_bin_counts(reads: List, tag) -> Dict[Tuple, Counter]:
    """Per-bin (reference, corrected-prefix) counters of the gap-stripped
    next tag, after the push() length gate (correct_tags.rs:50-120)."""
    from clique_tpu.collapse.pipeline import _gate_tag

    counts: Dict[Tuple, Counter] = {}
    for read in reads:
        gapless = _gate_tag(read, tag)
        if gapless is not None:
            bin_key = (read.reference_name,) + read.key_tuple()
            counts.setdefault(bin_key, Counter())[gapless] += 1
    return counts


def _merge_level_counts(level_dir: str, num_processes: int
                        ) -> Dict[Tuple, Counter]:
    merged: Dict[Tuple, Counter] = {}
    for p in range(num_processes):
        with open(os.path.join(level_dir, f"counts.p{p}.pkl"), "rb") as fh:
            for bin_key, counter in pickle.load(fh).items():
                if bin_key in merged:
                    merged[bin_key].update(counter)
                else:
                    merged[bin_key] = Counter(counter)
    return merged


def distributed_sort_level(reads: List, tag, known_lists, mesh,
                           level_dir: str, process_id: int,
                           num_processes: int,
                           n_buckets: int = 256) -> List:
    """One correction level across hosts: count locally, psum the bin
    histogram for ownership, owners build correction maps, everyone
    applies the merged maps. Returns this process's corrected reads."""
    import numpy as np

    from clique_tpu.collapse.pipeline import (
        _apply_correction_one,
        _gate_tag,
        _known_correction,
    )
    from clique_tpu.config.layout import UMISortType
    from clique_tpu.parallel.groupby import assign_bucket_owners, tag_bucket

    os.makedirs(level_dir, exist_ok=True)
    local_counts = _local_bin_counts(reads, tag)

    # publish local counters (the all-to-all payload, via shared FS)
    with open(os.path.join(level_dir, f"counts.p{process_id}.pkl.tmp"),
              "wb") as fh:
        pickle.dump(local_counts, fh, protocol=4)
    os.replace(os.path.join(level_dir, f"counts.p{process_id}.pkl.tmp"),
               os.path.join(level_dir, f"counts.p{process_id}.pkl"))

    # psum bucket histogram over the mesh -> deterministic owners
    local_hist = np.zeros(n_buckets, dtype=np.int32)
    for bin_key, counter in local_counts.items():
        local_hist[tag_bucket(pickle.dumps(bin_key, protocol=4),
                              n_buckets)] += sum(counter.values())
    _barrier(f"counts-level-{tag.order}", num_processes)
    hist = psum_histogram(mesh, local_hist)
    owner = assign_bucket_owners(hist, num_processes)

    # owners build correction maps for their bins over the GLOBAL counts
    merged = _merge_level_counts(level_dir, num_processes)
    mine = [bk for bk in merged
            if int(owner[tag_bucket(pickle.dumps(bk, protocol=4),
                                    n_buckets)]) == process_id]
    from clique_tpu.collapse.correct import correct_degenerate_groups

    if tag.sort_type == UMISortType.DEGENERATE_TAG:
        corrections = correct_degenerate_groups(
            [merged[bk] for bk in mine], tag.max_distance, tag.length,
            tag.minimum_collapsing_difference or 5.0)
    else:
        corrections = [_known_correction(merged[bk], tag, known_lists)
                       for bk in mine]
    with open(os.path.join(level_dir, f"maps.p{process_id}.pkl.tmp"),
              "wb") as fh:
        pickle.dump(dict(zip(mine, corrections)), fh, protocol=4)
    os.replace(os.path.join(level_dir, f"maps.p{process_id}.pkl.tmp"),
               os.path.join(level_dir, f"maps.p{process_id}.pkl"))
    _barrier(f"maps-level-{tag.order}", num_processes)

    maps: Dict[Tuple, Dict] = {}
    for p in range(num_processes):
        with open(os.path.join(level_dir, f"maps.p{p}.pkl"), "rb") as fh:
            maps.update(pickle.load(fh))

    out: List = []
    for read in reads:
        if _gate_tag(read, tag) is None:
            continue
        bin_key = (read.reference_name,) + read.key_tuple()
        applied = _apply_correction_one(read, tag, maps[bin_key])
        if applied is not None:
            out.append(applied)
    log.info("p%d level %s: %d bins (%d owned), %d -> %d reads",
             process_id, tag.symbol, len(merged), len(mine), len(reads),
             len(out))
    return out


def collapse_distributed(output_path: str, layout, input_bam: str,
                         work_dir: str, *, process_id: int = 0,
                         num_processes: int = 1,
                         coordinator_address: Optional[str] = None,
                         correct_only: bool = False,
                         downsample_cap: int = 40,
                         n_shards: int = 32,
                         n_buckets: int = 256):
    """Distributed collapse over num_processes hosts sharing work_dir.

    Every process calls this with identical arguments except process_id;
    process 0 writes the output BAM (returns CollapseStats for the LOCAL
    slice on every process)."""
    from clique_tpu.collapse.pipeline import (
        CollapseStats,
        _consensus_record,
        load_known_lists,
        ref_seq_map,
    )
    from clique_tpu.collapse.shards import ShardWriter, shard_paths, _read_shard
    from clique_tpu.io.sam import open_alignment_writer
    from clique_tpu.reference.manager import ReferenceManager

    init_distributed(coordinator_address, num_processes, process_id)
    mesh = global_mesh()
    rm = ReferenceManager.from_layout(layout)
    known_lists = load_known_lists(layout)
    stats = CollapseStats()
    t0 = time.time()

    reads_by_ref = _ingest_slice(input_bam, layout, rm, process_id,
                                 num_processes, stats)

    for ref in rm.references.values():
        reads = reads_by_ref.get(ref.name, [])
        safe = "".join(c if c.isalnum() else "_" for c in ref.name)
        for lvl, tag in enumerate(
                layout.get_sorted_umi_configurations(ref.name)):
            level_dir = os.path.join(work_dir, f"{safe}.l{lvl}")
            reads = distributed_sort_level(
                reads, tag, known_lists, mesh, level_dir, process_id,
                num_processes, n_buckets=n_buckets)
        reads_by_ref[ref.name] = reads

    # the one read exchange: spill by final group key, owners collapse
    spill_dir = os.path.join(work_dir, f"final.p{process_id}")
    with ShardWriter(spill_dir, n_shards=n_shards) as sw:
        for reads in reads_by_ref.values():
            for r in reads:
                sw.push((r.reference_name,) + r.key_tuple(), r)
    _barrier("final-spill", num_processes)

    ref_seqs = ref_seq_map(rm)
    records = []
    for s in range(n_shards):
        if s % num_processes != process_id:
            continue
        items: List = []
        for p in range(num_processes):
            path = os.path.join(work_dir, f"final.p{p}",
                                f"shard{s:04d}.cqs")
            if os.path.exists(path):
                items.extend(_read_shard(path))
        items.sort(key=lambda kv: kv[0])
        i = 0
        while i < len(items):
            j = i
            key = items[i][0]
            while j < len(items) and items[j][0] == key:
                j += 1
            group = [it for _k, it in items[i:j]]
            i = j
            units = [[r] for r in group] if correct_only else [group]
            for g in units:
                rec = _consensus_record(
                    g, ref_seqs, downsample_cap if not correct_only else 0,
                    0.75)
                if rec is not None:
                    records.append(rec)
    with open(os.path.join(work_dir, f"records.p{process_id}.pkl.tmp"),
              "wb") as fh:
        pickle.dump(records, fh, protocol=4)
    os.replace(os.path.join(work_dir, f"records.p{process_id}.pkl.tmp"),
               os.path.join(work_dir, f"records.p{process_id}.pkl"))
    _barrier("records", num_processes)

    if process_id == 0:
        references = [(r.name, len(r.sequence))
                      for r in rm.references.values()]
        writer = open_alignment_writer(output_path, references)
        total = 0
        for p in range(num_processes):
            with open(os.path.join(work_dir, f"records.p{p}.pkl"),
                      "rb") as fh:
                recs = pickle.load(fh)
            for rec in recs:
                writer.write(rec)
            total += len(recs)
        writer.close()
        log.info("distributed collapse: %d processes, %d records, %.1fs",
                 num_processes, total, time.time() - t0)
    _barrier("done", num_processes)
    return stats
