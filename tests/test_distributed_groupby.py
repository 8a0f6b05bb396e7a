"""Distributed tag-groupby tests on the virtual 8-device mesh: the
multi-host collapse must produce the same groups as single-host."""

from collections import Counter

import numpy as np
import pytest

from clique_tpu.parallel.groupby import (
    assign_bucket_owners,
    bucket_histogram,
    distributed_group_keys,
    exchange_by_owner,
    tag_bucket,
)


def _mesh():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from clique_tpu.parallel.mesh import make_mesh

    return make_mesh(8)


def test_bucket_histogram_psum():
    mesh = _mesh()
    buckets = np.array([0, 1, 1, 2, 2, 2, 3, 3] * 2, dtype=np.int32)
    hist = bucket_histogram(mesh, buckets, 4)
    assert hist.tolist() == [2, 4, 6, 4]


def test_owner_assignment_balanced_and_deterministic():
    hist = np.array([100, 1, 1, 1, 50, 49], dtype=np.int64)
    owner = assign_bucket_owners(hist, 2)
    owner2 = assign_bucket_owners(hist, 2)
    assert (owner == owner2).all()
    load = [int(hist[owner == h].sum()) for h in (0, 1)]
    assert abs(load[0] - load[1]) <= 100  # roughly balanced


def test_groups_never_split_across_owners():
    rng = np.random.default_rng(4)
    tags = [bytes(rng.choice(list(b"ACGT"), 12)) for _ in range(40)]
    # 4 hosts each observing overlapping tag multisets
    per_host = [list(rng.choice(len(tags), 30)) for _ in range(4)]
    per_host_keys = [[tags[i] for i in host] for host in per_host]
    mesh = _mesh()
    hist, owner = distributed_group_keys(mesh, per_host_keys, n_buckets=64)
    assert int(hist.sum()) == sum(len(k) for k in per_host_keys)

    items = [[(h, i) for i, _k in enumerate(keys)]
             for h, keys in enumerate(per_host_keys)]
    routed = exchange_by_owner(items, per_host_keys, owner, 64)
    # every read with the same tag must land on the same host
    tag_to_host = {}
    for h, host_items in enumerate(routed):
        for (src_h, src_i) in host_items:
            key = per_host_keys[src_h][src_i]
            assert tag_to_host.setdefault(key, h) == h
    # nothing lost
    assert sum(len(r) for r in routed) == sum(len(k) for k in per_host_keys)
