"""Sketch primitives (stages/sketch.py): KMV distinct count,
Misra-Gries heavy hitters, Bloom filter build/probe.

Properties under test:
 - mix64 is a bijection mod 2^64 (distinct keys -> distinct hashes).
 - _mg_trim is a valid Misra-Gries summary: undercount bounded by
   N/(m+1), never overcounts, <= m survivors.
 - heavy_hitters is EXACT (matches brute-force groupby threshold) on
   skewed random data, across block boundaries.
 - kmv_distinct estimator lands within the published KMV error bound
   (~1/sqrt(k-2)) on a large-cardinality set, and degenerates to the
   exact count below k.
 - bloom_mask has no false negatives, and the false-positive rate is
   near the (1 - e^{-kn/m})^k design point.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ioverlay_ray.stages.sketch import (
    MIX_MULT, _mg_trim, bloom_mask, build_bloom, heavy_hitters,
    kmv_distinct, mix64)


def test_mix64_bijection_sample():
    rng = np.random.default_rng(0)
    v = rng.integers(-2**62, 2**62, size=200_000, dtype=np.int64)
    v = np.unique(v)
    h = mix64(v)
    assert len(np.unique(h)) == len(v)
    # matches explicit python big-int arithmetic (the SQL replay)
    for x in v[:50]:
        assert int(h[np.searchsorted(v, x)]) == \
            (int(x) % 2**64 * MIX_MULT) % 2**64


def test_mg_trim_bounds():
    rng = np.random.default_rng(1)
    keys = rng.zipf(1.3, size=50_000).astype(np.int64)
    uk, uc = np.unique(keys, return_counts=True)
    m = 20
    tk, tc = _mg_trim(uk, uc.astype(np.int64), m)
    assert len(tk) <= m
    true = dict(zip(uk.tolist(), uc.tolist()))
    bound = len(keys) // (m + 1) + 1
    for k, c in zip(tk.tolist(), tc.tolist()):
        assert 0 < c <= true[k]          # never overcounts
        assert true[k] - c <= bound      # bounded undercount
    # every key with true count > N/(m+1) survives
    for k, c in true.items():
        if c > len(keys) // (m + 1):
            assert k in set(tk.tolist())


def test_heavy_hitters_exact_vs_brute(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(2)
    # skewed: a few hot users + long tail, shuffled across blocks
    vals = np.concatenate([
        np.repeat(np.arange(5, dtype=np.int64), 400),
        rng.integers(100, 5000, size=8000, dtype=np.int64)])
    rng.shuffle(vals)
    ds = rd.from_arrow(pa.table({"u": vals})).repartition(7)
    out = heavy_hitters(ds, "u", phi_num=2, phi_den=100)
    thresh = (2 * len(vals) + 99) // 100
    g = pd.Series(vals).value_counts()
    expect = sorted(int(k) for k, c in g.items() if c >= thresh)
    assert out["u"].tolist() == expect
    assert out["n"].tolist() == [int(g[k]) for k in expect]


def test_kmv_accuracy_and_degenerate(ray_session):
    import ray.data as rd
    n_true = 40_000
    vals = np.arange(n_true, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"u": np.tile(vals, 2)})).repartition(5)
    out = kmv_distinct(ds, "u", k=256)
    est = int(out["est_distinct"].iloc[0])
    # KMV relative error ~ 1/sqrt(k-2) ~ 6.3%; allow 4 sigma
    assert abs(est - n_true) / n_true < 0.25
    # below k the sketch is exact
    small = rd.from_arrow(pa.table({"u": np.arange(37, dtype=np.int64)}))
    out2 = kmv_distinct(small, "u", k=64)
    assert int(out2["est_distinct"].iloc[0]) == 37
    assert int(out2["n_kept"].iloc[0]) == 37


def test_bloom_no_false_negatives(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(3)
    members = np.unique(rng.integers(0, 2**40, 5000).astype(np.int64))
    ds = rd.from_arrow(pa.table({"key": members})).repartition(4)
    words = build_bloom(ds, "key", log2_m=16, k=4)
    assert bloom_mask(members, words, 16, 4).all()
    probe = np.unique(rng.integers(2**41, 2**42, 20_000).astype(np.int64))
    fp = bloom_mask(probe, words, 16, 4).mean()
    # design point: (1 - e^{-kn/m})^k with n=5000, m=65536, k=4 -> ~0.4%
    assert fp < 0.05


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001"])
def test_sketch_queries_smoke(ray_session, sf):
    from ioverlay_ray.pipelines import relational as rq
    kmv = rq.q_events_kmv_distinct(sf)
    assert kmv["n_kept"].iloc[0] <= 64
    hh = rq.q_events_heavy_users(sf)
    assert (hh["n"] > 0).all()
    rev = rq.q_lineitem_bloom_revenue(sf)
    assert set(rev["l_returnflag"]) <= {"A", "N", "R"}
    assert (rev["n_items"] > 0).all()
