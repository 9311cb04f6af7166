"""Distributed k-means (Lloyd's) over an embedding column.

Semantic clustering for training-data curation: balance domains,
cap per-cluster sampling, or drive cluster-aware dedup. The iteration
is NOT a shared-mutable-state problem (assignments are stateless given
the centroids), so unlike ``stages/cc.py`` it stays pure Ray Data:

- centroids are broadcast once per iteration (``ray.put``, k x d
  float64 — tiny), never re-shipped per batch; tasks resolve the ref
  zero-copy from local plasma, cached per worker process (the same
  ``_WORKER_CACHE`` pattern as ``ann.cosine_topk_fn``);
- each ``map_batches`` task emits k x (d+1) PARTIAL sums per block
  (assign + ``np.add.at`` fold — no per-row rows leave the worker);
- the driver reduces blocks x k partial rows (bounded by block count,
  not data size) and re-rounds the centroids.

Task pool, NOT an actor pool: an actor pool of C on a C-cpu cluster
reserves every CPU and starves the upstream read/repartition tasks
(observed as a deadlock at num_cpus=4); stateless tasks share the
scheduler with the rest of the pipeline, and the per-iteration state
is just the broadcast ref — nothing an actor would amortize.

Determinism contract with the SQL oracle: recomputed centroids are
quantized to the 1e-6 grid with floor(x*1e6 + 0.5)/1e6 (round-half-up,
identical in numpy and DuckDB), so both systems run every iteration
from EXACTLY equal centroids; assignment ties break toward the lowest
centroid id on both sides (np.argmin picks the first; SQL orders by
(distance, cid)).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .ann import embedding_matrix


def round6(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 1e6 + 0.5) / 1e6


def _assign(mat: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """argmin_c |x - c|^2 = argmin_c (|c|^2 - 2 x.c); ties -> lowest
    cid (np.argmin picks the first occurrence)."""
    d2 = (cents * cents).sum(axis=1)[None, :] - 2.0 * (mat @ cents.T)
    return np.argmin(d2, axis=1)


_WORKER_CACHE: dict = {}


def _cents_local(cref) -> np.ndarray:
    """Resolve a broadcast centroid ref once per worker process."""
    c = _WORKER_CACHE.get(cref)
    if c is None:
        c = ray.get(cref) if isinstance(cref, ray.ObjectRef) else cref
        _WORKER_CACHE[cref] = c
    return c


def partial_sums_fn(cref):
    """One k-means iteration's map side: per-block (cid, count,
    per-dimension sums) partials."""
    def fn(batch: pa.Table) -> pa.Table:
        cents = _cents_local(cref)
        mat = embedding_matrix(batch).astype(np.float64)
        k, d = cents.shape
        assign = _assign(mat, cents)
        counts = np.bincount(assign, minlength=k).astype(np.int64)
        sums = np.zeros((k, d), np.float64)
        np.add.at(sums, assign, mat)
        return pa.table({
            "cid": pa.array(np.arange(k, dtype=np.int64)),
            "cnt": pa.array(counts),
            "sums": pa.array(list(sums), pa.list_(pa.float64())),
        })
    return fn


def assign_fn(cref):
    def fn(batch: pa.Table) -> pa.Table:
        cents = _cents_local(cref)
        mat = embedding_matrix(batch).astype(np.float64)
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "cluster": pa.array(
                _assign(mat, cents).astype(np.int64), pa.int64()),
        })
    return fn


def kmeans_fit(ds, init_cents: np.ndarray, iters: int = 3,
               concurrency=None) -> np.ndarray:
    """Lloyd iterations over an embedding Dataset; returns the final
    (k, d) float64 centroids. ``init_cents`` rows are cluster ids
    0..k-1 in order. Empty clusters keep their previous centroid.
    ``concurrency`` is accepted for signature parity but unused —
    stateless tasks let the streaming executor size the pool."""
    cents = np.asarray(init_cents, np.float64)
    k = len(cents)
    for _ in range(iters):
        cref = ray.put(cents)
        partials = ds.map_batches(
            partial_sums_fn(cref),
            batch_format="pyarrow").to_pandas()
        cnt = np.zeros(k, np.int64)
        sums = np.zeros_like(cents)
        for cid, c, s in zip(partials["cid"], partials["cnt"],
                             partials["sums"]):
            cnt[cid] += c
            sums[cid] += np.asarray(s, np.float64)
        nz = cnt > 0
        new = cents.copy()
        new[nz] = round6(sums[nz] / cnt[nz, None])
        cents = new
    return cents


def kmeans_assign(ds, cents: np.ndarray, concurrency=None):
    """Final assignment pass: Dataset (vec_id, cluster)."""
    cref = ray.put(np.asarray(cents, np.float64))
    return ds.map_batches(assign_fn(cref), batch_format="pyarrow")
