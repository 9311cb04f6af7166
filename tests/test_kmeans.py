"""Distributed k-means (stages/kmeans.py) vs a driver-side brute
Lloyd's with the identical rounding contract."""

import numpy as np
import pyarrow as pa


def _make_ds(mat, ids):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float32())),
    })).repartition(4)


def _brute(mat, init, iters):
    from ioverlay_ray.stages.kmeans import _assign, round6
    cents = init.copy()
    for _ in range(iters):
        a = _assign(mat, cents)
        new = cents.copy()
        for c in range(len(cents)):
            m = a == c
            if m.any():
                new[c] = round6(mat[m].mean(axis=0))
        cents = new
    return cents, _assign(mat, cents)


def test_kmeans_matches_brute(ray_session):
    from ioverlay_ray.stages.kmeans import kmeans_assign, kmeans_fit
    rng = np.random.default_rng(3)
    mat64 = rng.standard_normal((300, 16)).astype(np.float32)
    mat = mat64.astype(np.float64)
    init = mat[:4].copy()
    ds = _make_ds(mat64, np.arange(300))
    cents = kmeans_fit(ds, init, iters=3)
    exp_cents, exp_assign = _brute(mat, init, 3)
    assert np.array_equal(cents, exp_cents)
    out = kmeans_assign(ds, cents).to_pandas().sort_values("vec_id")
    assert np.array_equal(out["cluster"].to_numpy(), exp_assign)


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    from ioverlay_ray.stages.kmeans import kmeans_fit
    # two tight blobs, three centroids; the far-away third centroid
    # never wins a point and must stay put
    rng = np.random.default_rng(5)
    blob_a = rng.normal(0.0, 0.01, (40, 4))
    blob_b = rng.normal(5.0, 0.01, (40, 4))
    mat = np.concatenate([blob_a, blob_b]).astype(np.float32)
    init = np.array([[0.0] * 4, [5.0] * 4, [1e6] * 4])
    ds = _make_ds(mat, np.arange(80))
    cents = kmeans_fit(ds, init, iters=2)
    assert np.array_equal(cents[2], init[2])
    assert np.abs(cents[0]).max() < 0.1
    assert np.abs(cents[1] - 5.0).max() < 0.1
