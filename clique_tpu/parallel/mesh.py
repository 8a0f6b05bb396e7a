"""Multi-chip scaling: device mesh + data-parallel align step.

The reference engine is single-node shared-memory (SURVEY 2.11); its rayon
read-loop fanout becomes, on TPU, a 1-D `data` mesh over all chips:

- read batches are sharded over `data` (each chip aligns its shard with the
  batched DP kernel);
- the amplicon reference panel is replicated per chip;
- cross-chip aggregations (per-reference assignment histograms here; per-tag
  group histograms for the collapse stage) ride ICI via psum.

This module is exercised on a virtual CPU mesh in tests and by the driver's
dryrun_multichip; the same code runs unchanged on a real pod slice.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from clique_tpu.align.batch import align_batch_device


def make_mesh(n_devices: int = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        assert len(devices) >= n_devices, (
            f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=("data",))


def sharded_align_step(mesh: Mesh, refs, reads, ref_lens, read_lens, params,
                       *, n1: int, n2: int, n_refs: int):
    """One data-parallel align step over the mesh.

    Returns (scores [B], ops [B,T], n_ops [B], histogram [n_refs]) where the
    histogram of reference assignments is psum-merged across chips (the
    collective pattern the collapse stage uses for cross-host tag groupby).
    """
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    @functools.partial(
        jax.jit,
        in_shardings=(data, data, data, data, repl),
        out_shardings=(data, data, data, repl),
    )
    def step(refs, reads, ref_lens, read_lens, params):
        bw = jnp.maximum(ref_lens, read_lens)
        result, _tb = align_batch_device(
            refs, reads, ref_lens, read_lens, bw, params, n1=n1, n2=n2)
        # toy per-reference assignment histogram: bucket by score sign/step,
        # stands in for the collapse stage's tag-hash histograms. jnp.bincount
        # needs static size; use one-hot sum (XLA turns this into a psum
        # across the sharded batch axis at the out_shardings boundary).
        bucket = jnp.clip(result.n_ops % n_refs, 0, n_refs - 1)
        hist = jnp.sum(
            jax.nn.one_hot(bucket, n_refs, dtype=jnp.int32), axis=0)
        return result.score, result.ops, result.n_ops, hist

    return step(refs, reads, ref_lens, read_lens, params)
