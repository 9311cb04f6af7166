"""Similarity search over an embedding column.

Brute-force cosine top-k: the query matrix is broadcast once via
ray.put and each batch does one float64 matmul against it; per-batch
partial top-k results are merged by a tiny final reduction. The
LSH-bucketed variant hashes embeddings into hyperplane buckets
(stateful actor holds the projection) so candidate generation becomes a
groupby at scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def embedding_matrix(batch, col: str = "embedding") -> np.ndarray:
    """Arrow list<float>/fixed_size_list<float> column -> (n, dim)
    float64 matrix via a zero-copy flat-values reshape (no Python-list
    round trip). Falls back to to_pylist only for ragged lists."""
    arr = batch.column(col) if hasattr(batch, "column") else batch
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    if pa.types.is_fixed_size_list(arr.type):
        if arr.null_count:
            return np.array(arr.to_pylist(), dtype=np.float64)
        dim = arr.type.list_size
        # arr.values on a sliced FixedSizeListArray still spans the
        # whole backing buffer — honor the slice offset explicitly
        flat = np.asarray(arr.values)
        start = arr.offset * dim
        flat = flat[start:start + n * dim]
        return flat.reshape(n, dim).astype(np.float64, copy=False)
    if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
        offs = np.asarray(arr.offsets)
        strides = np.diff(offs)
        if len(strides) and np.all(strides == strides[0]) \
                and strides[0] > 0:
            flat = np.asarray(arr.values)[offs[0]:offs[-1]]
            return flat.reshape(n, int(strides[0])) \
                .astype(np.float64, copy=False)
    return np.array(arr.to_pylist(), dtype=np.float64)


class CosineTopKStage:
    """batch -> partial top-k rows (query_id, vec_id, score) per query.

    queries_ref: ray.ObjectRef to a float64 (nq, dim) matrix (broadcast
    once, NOT re-shipped per batch) — or the matrix itself for local use.
    """

    def __init__(self, queries, query_ids, k: int = 5):
        import ray
        if isinstance(queries, ray.ObjectRef):
            queries = ray.get(queries)
        q = np.asarray(queries, dtype=np.float64)
        self.qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        self.query_ids = list(query_ids)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id"), dtype=np.int64)
        emb = embedding_matrix(batch)
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (emb / norms) @ self.qn.T          # (n, nq)
        k = min(self.k, sims.shape[0])
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(self.query_ids):
            col = sims[:, qi]
            top = np.argpartition(-col, k - 1)[:k]
            for t in top:
                out_q.append(qid)
                out_v.append(int(ids[t]))
                out_s.append(float(col[t]))
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
        })


def merge_topk(partials: pa.Table, k: int = 5) -> pa.Table:
    """Final merge of per-batch partial top-k (small)."""
    df = partials.to_pandas()
    df = df.sort_values(["query_id", "score", "vec_id"],
                        ascending=[True, False, True])
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df = df[df["rank"] <= k][["query_id", "vec_id", "rank"]]
    return pa.Table.from_pandas(
        df.reset_index(drop=True),
        preserve_index=False).replace_schema_metadata(None)


class HyperplaneLSHStage:
    """embedding -> (bucket, vec_id): sign-random-projection LSH for the
    scale path (candidates colocate by bucket groupby)."""

    def __init__(self, dim: int, n_planes: int = 16, seed: int = 11):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes))

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = embedding_matrix(batch)
        bits = (emb @ self.planes) > 0
        bucket = bits @ (1 << np.arange(bits.shape[1], dtype=np.int64))
        return pa.table({
            "bucket": pa.array(bucket.astype(np.int64), pa.int64()),
            "vec_id": batch.column("vec_id"),
        })


class IVFScanStage:
    """IVF (inverted-file) ANN scan stage — the classic scale path:
    vectors are coarsely quantized to their nearest centroid (argmax
    dot against fixed seeded unit centroids, data-independent so the
    SQL oracle can reproduce them as literals), and each query scores
    ONLY vectors whose list is among its ``nprobe`` closest lists.
    Emits per-batch partial top-k; merge with merge_topk."""

    def __init__(self, queries, query_ids, k_lists: int = 16,
                 nprobe: int = 4, k: int = 5, seed: int = 13):
        import ray
        if isinstance(queries, ray.ObjectRef):
            queries = ray.get(queries)
        rng = np.random.default_rng(seed)
        c = rng.standard_normal((k_lists, len(np.asarray(queries)[0])))
        self.cents = c / np.linalg.norm(c, axis=1, keepdims=True)
        q = np.asarray(queries, dtype=np.float64)
        self.qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        self.query_ids = list(query_ids)
        self.k = k
        # per-query probe set: top-nprobe centroids by dot, ties by id
        dots = self.qn @ self.cents.T
        self.probes = []
        for qi in range(len(self.qn)):
            order = sorted(range(k_lists), key=lambda c_: (-dots[qi, c_], c_))
            self.probes.append(set(order[:nprobe]))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id"), dtype=np.int64)
        emb = embedding_matrix(batch)
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        en = emb / norms
        cd = en @ self.cents.T                     # (n, k_lists)
        assign = np.argmax(cd, axis=1)             # ties -> lowest id
        sims = en @ self.qn.T                      # (n, nq)
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(self.query_ids):
            probed = np.isin(assign, list(self.probes[qi]))
            if not probed.any():
                continue
            col = sims[probed, qi]
            vid = ids[probed]
            k = min(self.k, len(col))
            top = np.argpartition(-col, k - 1)[:k]
            for t in top:
                out_q.append(qid)
                out_v.append(int(vid[t]))
                out_s.append(float(col[t]))
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
        })


_WORKER_CACHE: dict = {}


def cosine_topk_fn(queries_ref, query_ids, k: int = 5):
    """Task-pool form of CosineTopKStage (prestarted workers, cached
    normalized query matrix per worker process)."""
    qid_key = tuple(query_ids)

    def fn(batch: pa.Table) -> pa.Table:
        key = ("cos", queries_ref, qid_key, k)
        st = _WORKER_CACHE.get(key)
        if st is None:
            st = CosineTopKStage(queries_ref, list(qid_key), k)
            _WORKER_CACHE[key] = st
        return st(batch)
    return fn
