"""Distributed connected components (stages/cc.py)."""

import numpy as np
import pyarrow as pa
import pytest


def _cc(edges, **kw):
    import ray.data

    from ioverlay_ray.stages.cc import connected_components
    src = [a for a, _ in edges]
    dst = [b for _, b in edges]
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64()),
    }))
    out = connected_components(ds, **kw).to_pandas()
    return dict(zip(out["id"].astype(int), out["label"].astype(int)))


def _brute(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_cc_chain_star_isolated(ray_session):
    # chain 1-2-3-4-5, star 10-{11,12,13}, isolated self-loop 99
    edges = [(1, 2), (2, 3), (3, 4), (4, 5),
             (10, 11), (10, 12), (10, 13), (99, 99)]
    labels = _cc(edges)
    assert labels == _brute(edges)
    assert labels[5] == 1 and labels[13] == 10 and labels[99] == 99


def test_cc_random_vs_union_find(ray_session):
    rng = np.random.default_rng(7)
    n = 400
    edges = [(int(a), int(b))
             for a, b in rng.integers(0, 120, size=(n, 2)).tolist()]
    # a long path stresses the diameter-bound round count
    edges += [(1000 + i, 1001 + i) for i in range(60)]
    assert _cc(edges, num_partitions=4) == _brute(edges)


def test_cc_converges_and_is_min_labelled(ray_session):
    # two components whose min ids arrive through different paths
    edges = [(7, 3), (3, 9), (9, 2), (50, 40), (40, 60)]
    labels = _cc(edges)
    assert set(labels.values()) == {2, 40}


def test_cc_max_iters_guard(ray_session):
    # max_iters=0 must terminate with the init labels (min incident
    # neighbour), not hang: node 3 only sees neighbour 2
    labels = _cc([(1, 2), (2, 3)], max_iters=0)
    assert labels == {1: 1, 2: 1, 3: 2}
