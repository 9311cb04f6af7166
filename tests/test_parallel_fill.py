"""Sharded (Ray task wave) fill vs the in-process kernel: identical."""

import numpy as np


def test_parallel_fill_identical(ray_session, monkeypatch):
    from ioverlay_ray.geometry.float_api import float_overlay
    from ioverlay_ray.pipelines import parallel_fill as pf
    from ioverlay_ray.pipelines.perf_workloads import spiral

    monkeypatch.setattr(pf, "PARALLEL_MIN_SEGS", 1)

    # single connected component (the regime the decomposition exists
    # for) + a random multi-component rect soup crossing shard borders
    path = spiral(2048)
    seq = float_overlay([path], [], "subject", "nonzero")
    par = pf.parallel_overlay([path], [], "subject", "nonzero",
                              shards=5)
    assert seq == par

    rng = np.random.default_rng(17)
    subj, clip = [], []
    for dst, m in ((subj, 40), (clip, 40)):
        for _ in range(m):
            x0, y0 = (int(v) for v in rng.integers(0, 400, 2))
            w, h = (int(v) for v in rng.integers(1, 120, 2))
            dst.append([(x0, y0), (x0 + w, y0), (x0 + w, y0 + h),
                        (x0, y0 + h)])
    for rule in ("union", "intersect", "xor", "difference"):
        seq = float_overlay(subj, clip, rule, "evenodd")
        par = pf.parallel_overlay(subj, clip, rule, "evenodd",
                                  shards=7)
        assert seq == par, rule


def test_parallel_fill_fallback_below_threshold(ray_session):
    # below PARALLEL_MIN_SEGS the hook must not pay a task wave; it
    # still returns the identical result through the kernel path
    from ioverlay_ray.geometry.float_api import float_overlay
    from ioverlay_ray.pipelines import parallel_fill as pf

    sq = [[(0, 0), (10, 0), (10, 10), (0, 10)]]
    assert pf.parallel_overlay(sq, [], "subject", "nonzero") == \
        float_overlay(sq, [], "subject", "nonzero")
