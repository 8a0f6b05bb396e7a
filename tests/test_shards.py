"""Out-of-core shard container: partition integrity, group completeness,
global merge order."""

import numpy as np

from clique_tpu.collapse.shards import (
    ShardWriter,
    iter_globally_sorted,
    iter_sorted_groups,
    key_shard,
    shard_paths,
)

RNG = np.random.default_rng(17)


def test_roundtrip_groups(tmp_path):
    d = str(tmp_path / "spill")
    keys = [(f"ref", bytes(RNG.choice(list(b"ACGT"), 8))) for _ in range(40)]
    truth = {}
    with ShardWriter(d, n_shards=8) as w:
        for i in range(5000):
            k = keys[int(RNG.integers(len(keys)))]
            item = ("read%d" % i, i)
            w.push(k, item)
            truth.setdefault(k, []).append(item)
        assert w.items_written == 5000

    seen = {}
    for key, items in iter_sorted_groups(d):
        assert key not in seen, "group split across yields"
        seen[key] = items
    assert set(seen) == set(truth)
    for k in truth:
        assert sorted(seen[k]) == sorted(truth[k])


def test_equal_keys_one_shard():
    for n in (4, 32, 128):
        k = ("x", b"ACGTACGT", 3)
        assert key_shard(k, n) == key_shard(k, n)
        assert 0 <= key_shard(k, n) < n


def test_global_merge_sorted(tmp_path):
    d = str(tmp_path / "spill")
    with ShardWriter(d, n_shards=4) as w:
        for i in range(1000):
            w.push(int(RNG.integers(100)), i)
    assert len(shard_paths(d)) == 4
    out = list(iter_globally_sorted(d))
    assert len(out) == 1000
    ks = [k for k, _v in out]
    assert ks == sorted(ks)


def test_multi_dir_merge(tmp_path):
    """Independent writers (one per worker) with the same n_shards merge
    into complete groups - equal keys never split across the union."""
    dirs = [str(tmp_path / f"w{i}") for i in range(3)]
    keys = [bytes(RNG.choice(list(b"ACGT"), 6)) for _ in range(20)]
    truth = {}
    writers = [ShardWriter(d, n_shards=8) for d in dirs]
    for i in range(3000):
        k = keys[int(RNG.integers(len(keys)))]
        w = writers[int(RNG.integers(3))]
        w.push(k, i)
        truth.setdefault(k, []).append(i)
    for w in writers:
        w.close()

    seen = {}
    for key, items in iter_sorted_groups(dirs):
        assert key not in seen, "group split across yields"
        seen[key] = items
    assert set(seen) == set(truth)
    for k in truth:
        assert sorted(seen[k]) == sorted(truth[k])


def test_empty_dir(tmp_path):
    d = str(tmp_path / "spill")
    with ShardWriter(d, n_shards=2):
        pass
    assert list(iter_sorted_groups(d)) == []
    assert list(iter_globally_sorted(d)) == []
