"""BVH builder tests (ref test model: bvh_builder_test.go:10-69 — synthetic
AABBs, leaf-callback counts, node totals) + structural invariants."""

import numpy as np

from polaris_tpu.asset.compiler import bvh


def _boxes():
    # 4 unit boxes spread along x
    mins = np.array([[0, 0, 0], [2, 0, 0], [4, 0, 0], [6, 0, 0]], np.float32)
    maxs = mins + 1.0
    ctrs = (mins + maxs) / 2
    return mins, maxs, ctrs


def test_min_leaf_1_partitions_fully():
    mins, maxs, ctrs = _boxes()
    leaves = []

    def cb(items):
        leaves.append(list(items))
        return -int(items[0]), 0

    arrays = bvh.build(mins, maxs, ctrs, 1, cb)
    assert len(leaves) == 4
    assert all(len(l) == 1 for l in leaves)
    # 4 leaves + 3 inner nodes
    assert len(arrays) == 7
    assert int((arrays.ldata > 0).sum()) == 3


def test_min_leaf_groups():
    mins, maxs, ctrs = _boxes()
    leaves = []

    def cb(items):
        leaves.append(list(items))
        return -int(items[0]), len(items)

    arrays = bvh.build(mins, maxs, ctrs, 2, cb)
    assert all(len(l) <= 2 for l in leaves)
    assert sum(len(l) for l in leaves) == 4


def test_node_bounds_contain_children():
    rs = np.random.RandomState(0)
    mins = rs.uniform(-10, 10, size=(200, 3)).astype(np.float32)
    maxs = mins + rs.uniform(0.1, 2.0, size=(200, 3)).astype(np.float32)
    ctrs = (mins + maxs) / 2
    seen = []

    def cb(items):
        seen.extend(items.tolist())
        return -int(items[0]), len(items)

    a = bvh.build(mins, maxs, ctrs, 4, cb)
    # every item placed exactly once
    assert sorted(seen) == list(range(200))
    # child AABBs inside parent AABBs
    inner = np.nonzero(a.ldata > 0)[0]
    for i in inner:
        for c in (a.ldata[i], a.rdata[i]):
            assert np.all(a.bmin[c] >= a.bmin[i] - 1e-5)
            assert np.all(a.bmax[c] <= a.bmax[i] + 1e-5)


def test_offset_children():
    mins, maxs, ctrs = _boxes()
    a = bvh.build(mins, maxs, ctrs, 1, lambda items: (-int(items[0]), 0))
    ld = a.ldata.copy()
    rd = a.rdata.copy()
    a.offset_children(100)
    inner = ld > 0
    assert np.all(a.ldata[inner] == ld[inner] + 100)
    assert np.all(a.ldata[~inner] == ld[~inner])  # leaves untouched
    assert np.all(a.rdata[inner] == rd[inner] + 100)
