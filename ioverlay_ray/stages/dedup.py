"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Exact dedup is the scalable pattern: hash-partition on a content key,
keep the min id per group (a groupby, not a global sort). Near-dup
variants emit candidate buckets via LSH banding so the wide step is a
groupby on band keys rather than an all-pairs comparison.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_M31 = (1 << 61) - 1


def _text_key(texts):
    return [hashlib.md5(t.encode()).hexdigest() for t in texts]


def exact_key_stage(batch: pa.Table) -> pa.Table:
    """doc -> (content_key, doc_id) for hash-partitioned exact dedup."""
    texts = batch.column("text").to_pylist()
    return pa.table({
        "content_key": pa.array(_text_key(texts), pa.string()),
        "doc_id": batch.column("doc_id"),
    })


def _shingles(text: str, k: int = 5):
    toks = text.split()
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]


class MinHashStage:
    """doc -> num_perm minhash signature over k-token shingles.

    Stateful: the permutation coefficients are built once per actor.
    """

    _P31 = (1 << 31) - 1  # Mersenne prime; 31-bit hashes keep a*h in int64

    def __init__(self, num_perm: int = 64, k: int = 5, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, self._P31, size=num_perm, dtype=np.int64)
        self.b = rng.integers(0, self._P31, size=num_perm, dtype=np.int64)
        self.k = k
        self.num_perm = num_perm
        # per-actor cache: shingle -> column in the permuted-value
        # matrix. Real corpora repeat shingles heavily, so the md5 +
        # permutation work per DISTINCT shingle is paid once per actor.
        self._cache: dict = {}
        self._vals = np.empty((num_perm, 0), dtype=np.int64)

    def _perm_columns(self, shingles) -> None:
        """Hash + permute shingles not yet cached (vectorized)."""
        new = [s for s in dict.fromkeys(shingles) if s not in self._cache]
        if not new:
            return
        # 31-bit md5-based shingle hash, little-endian first 8 bytes ==
        # DuckDB md5_number_upper & 0x7FFFFFFF (SQL-reproducible)
        hv = np.fromiter(
            (int.from_bytes(hashlib.md5(s.encode()).digest()[:8],
                            "little") & 0x7FFFFFFF for s in new),
            dtype=np.int64, count=len(new))
        # products stay < 2^62 because both factors are < 2^31
        vals = (self.a[:, None] * hv[None, :] + self.b[:, None]) % self._P31
        base = self._vals.shape[1]
        self._vals = np.concatenate((self._vals, vals), axis=1)
        for j, s in enumerate(new):
            self._cache[s] = base + j

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.k)
        if not sh:
            return np.zeros(self.num_perm, dtype=np.int64)
        self._perm_columns(sh)
        cols = [self._cache[s] for s in sh]
        return self._vals[:, cols].min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        doc_sh = [_shingles(t, self.k) for t in texts]
        self._perm_columns([s for sh in doc_sh for s in sh])
        flat = [self._cache[s] for sh in doc_sh for s in sh]
        lens = np.array([len(sh) for sh in doc_sh], dtype=np.int64)
        sigs = np.zeros((len(texts), self.num_perm), dtype=np.int64)
        nz = np.flatnonzero(lens)
        if len(nz):
            g = self._vals[:, flat]          # (num_perm, total)
            offs = np.concatenate(([0], np.cumsum(lens)))[:-1]
            mins = np.minimum.reduceat(g, offs[nz], axis=1)
            sigs[nz] = mins.T
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "minhash": pa.array(sigs.tolist(), pa.list_(pa.int64())),
        })


class MinHashBandStage(MinHashStage):
    """Fused doc -> LSH band rows (minhash signature computed in the
    same actor, never materialized as an Arrow column): one stage hop
    instead of two for the candidate pipeline."""

    def __init__(self, num_perm: int = 64, k: int = 5, seed: int = 7,
                 bands: int = 16, rows: int = 4):
        super().__init__(num_perm, k, seed)
        self.bands = bands
        self.rows = rows

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = super().__call__(batch)
        return LSHBandStage(self.bands, self.rows)(sigs)


_WORKER_STAGES: dict = {}


def minhash_band_rows(batch: pa.Table) -> pa.Table:
    """Task-pool form of MinHashBandStage: the stage (and its shingle
    cache) lives in a worker-process module global, so it runs on Ray's
    prestarted workers — no per-query actor spin-up — and the cache
    persists across queries on the same worker."""
    st = _WORKER_STAGES.get("minhash_bands")
    if st is None:
        st = MinHashBandStage()
        _WORKER_STAGES["minhash_bands"] = st
    return st(batch)


class LSHBandStage:
    """signature -> (band_key, doc_id) rows, one per band; a groupby on
    band_key yields the candidate buckets."""

    def __init__(self, bands: int = 16, rows: int = 4):
        self.bands = bands
        self.rows = rows

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = batch.column("minhash").to_pylist()
        ids = batch.column("doc_id").to_pylist()
        out_key, out_id = [], []
        for doc_id, sig in zip(ids, sigs):
            for b in range(self.bands):
                chunk = sig[b * self.rows:(b + 1) * self.rows]
                # canonical "<band>:v,v,v,v" form so DuckDB's md5 oracle
                # reproduces the key exactly
                canon = f"{b}:" + ",".join(str(int(v)) for v in chunk)
                key = hashlib.md5(canon.encode()).hexdigest()[:16]
                out_key.append(key)
                out_id.append(doc_id)
        return pa.table({
            "band_key": pa.array(out_key, pa.string()),
            "doc_id": pa.array(out_id, pa.int64()),
        })


class SimHashStage:
    """64-bit SimHash over token hashes."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        shifts = np.arange(64, dtype=np.uint64)
        out = []
        for t in texts:
            toks = t.split()
            if not toks:
                out.append(0)
                continue
            # little-endian first-8 bytes == DuckDB md5_number_upper
            hv = np.array(
                [int.from_bytes(hashlib.md5(tok.encode()).digest()[:8],
                                "little")
                 for tok in toks], dtype=np.uint64)
            bits = (hv[:, None] >> shifts[None, :]) & np.uint64(1)
            acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
            v = 0
            for bit in (acc > 0)[::-1]:
                v = (v << 1) | int(bit)
            out.append(v - (1 << 64) if v >= (1 << 63) else v)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "simhash": pa.array(out, pa.int64()),
        })


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    sa, sb = set(_shingles(text_a, k)), set(_shingles(text_b, k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)
