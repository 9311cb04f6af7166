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


def _mod_mersenne31(x: np.ndarray) -> np.ndarray:
    """x mod (2^31 - 1) for 0 <= x < 2^63, via shifts (int64 idiv is
    ~10x slower than this on the permute matrix). Mutates x."""
    M = np.int64((1 << 31) - 1)
    y = x & M
    x >>= np.int64(31)
    y += x            # < 2^32
    x = y >> np.int64(31)
    y &= M
    y += x            # <= M + 1
    y -= (y >= M) * M
    return y


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

    # permute+reduce runs in doc-aligned chunks of <= _PERM_CHUNK
    # shingle occurrences: the int64 scratch stays ~16 MB (under the
    # 32 MB malloc-reuse cap — fresh memory on this host costs ~50x a
    # warm pass, see BASELINE.md "Host allocator finding")
    _PERM_CHUNK = 1 << 15
    # the shingle->hash cache saves the per-occurrence Python md5; it
    # is capped so a 100-TB vocabulary can't grow an actor without
    # bound (missed shingles are simply hashed again)
    _CACHE_CAP = 4_000_000

    def __init__(self, num_perm: int = 64, k: int = 5, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, self._P31, size=num_perm, dtype=np.int64)
        self.b = rng.integers(0, self._P31, size=num_perm, dtype=np.int64)
        self.k = k
        self.num_perm = num_perm
        # per-actor cache: shingle -> 31-bit md5 hash (8 bytes/entry;
        # the 64 permuted values are recomputed vectorized per batch —
        # cheaper than gathering from a big table on this host, and no
        # unbounded 256 B/shingle table growth)
        self._cache: dict = {}
        self._mul_scratch = None

    def _hash_flat(self, flat) -> np.ndarray:
        """31-bit md5-based shingle hashes, little-endian first 8
        bytes == DuckDB md5_number_upper & 0x7FFFFFFF
        (SQL-reproducible); cache hits skip the md5."""
        cache = self._cache
        hv = np.fromiter((cache.get(s, -1) for s in flat),
                         dtype=np.int64, count=len(flat))
        miss = np.flatnonzero(hv < 0)
        if len(miss):
            md5 = hashlib.md5
            vals = {
                s: int.from_bytes(md5(s.encode()).digest()[:8],
                                  "little") & 0x7FFFFFFF
                for s in dict.fromkeys(flat[i] for i in miss)}
            if len(cache) < self._CACHE_CAP:
                cache.update(vals)
            hv[miss] = np.fromiter((vals[flat[i]] for i in miss),
                                   dtype=np.int64, count=len(miss))
        return hv

    def _sig_rows(self, hv: np.ndarray, offs: np.ndarray) -> np.ndarray:
        """Min over each [offs[i], offs[i+1]) run of the num_perm
        permutations of hv — doc-aligned chunks, reused scratch."""
        ndoc = len(offs) - 1
        out = np.empty((ndoc, self.num_perm), dtype=np.int64)
        CH = max(self._PERM_CHUNK, int((np.diff(offs)).max()))
        if self._mul_scratch is None \
                or self._mul_scratch.shape[0] < min(CH, offs[-1]):
            self._mul_scratch = np.empty(
                (min(CH, max(offs[-1], 1)), self.num_perm), np.int64)
        d0 = 0
        while d0 < ndoc:
            # greedy doc range with <= CH occurrences (>=1 doc)
            d1 = int(np.searchsorted(offs, offs[d0] + CH, "right")) - 1
            d1 = max(d1, d0 + 1)
            seg = hv[offs[d0]:offs[d1]]
            if self._mul_scratch.shape[0] < len(seg):   # one giant doc
                self._mul_scratch = np.empty(
                    (len(seg), self.num_perm), np.int64)
            m = self._mul_scratch[:len(seg)]
            # products stay < 2^62 because both factors are < 2^31
            np.multiply(seg[:, None], self.a[None, :], out=m)
            m += self.b[None, :]
            y = _mod_mersenne31(m)
            out[d0:d1] = np.minimum.reduceat(
                y, (offs[d0:d1] - offs[d0]), axis=0)
            d0 = d1
        return out

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.k)
        if not sh:
            return np.zeros(self.num_perm, dtype=np.int64)
        hv = self._hash_flat(sh)
        return self._sig_rows(hv, np.array([0, len(sh)]))[0]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        doc_sh = [_shingles(t, self.k) for t in texts]
        flat = [s for sh in doc_sh for s in sh]
        hv = self._hash_flat(flat)
        lens = np.array([len(sh) for sh in doc_sh], dtype=np.int64)
        sigs = np.zeros((len(texts), self.num_perm), dtype=np.int64)
        nz = np.flatnonzero(lens)
        if len(nz):
            offs_nz = np.concatenate(([0], np.cumsum(lens[nz])))
            sigs[nz] = self._sig_rows(hv, offs_nz)
        # flat values + arange offsets: no 320k-Python-int tolist round
        flat_vals = pa.array(sigs.reshape(-1), pa.int64())
        offsets = pa.array(
            np.arange(0, (len(texts) + 1) * self.num_perm, self.num_perm,
                      dtype=np.int32))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "minhash": pa.ListArray.from_arrays(offsets, flat_vals),
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


#: multiplier of the band-key polynomial mix (Knuth's 32-bit golden
#: ratio constant). Keys are h = fold(h * C + v mod 2^64) seeded with
#: the band index; < 2^32 so a HUGEINT (int128) SQL replay never
#: overflows before its explicit % 2^64.
_BAND_KEY_MULT = 2654435761


def band_key_sql_expr(bnd: str = "bnd", vals: str = "vs",
                      rows: int = 4) -> str:
    """DuckDB expression reproducing the vectorized band key exactly:
    the same polynomial mix over the raw band signature integers,
    mod-2^64 folded in HUGEINT, emitted as signed BIGINT."""
    expr = f"CAST({bnd} AS HUGEINT)"
    for j in range(1, rows + 1):
        expr = (f"(({expr}) * {_BAND_KEY_MULT} + {vals}[{j}])"
                " % 18446744073709551616")
    return (f"CAST(({expr}) - CASE WHEN ({expr}) >= "
            "9223372036854775808 THEN 18446744073709551616 ELSE 0 END"
            " AS BIGINT)")


class LSHBandStage:
    """signature -> (band_key, doc_id) rows, one per band; a groupby on
    band_key yields the candidate buckets.

    The key is a 64-bit polynomial mix over the band's raw signature
    integers seeded with the band index — one vectorized uint64 pass
    per batch (no per-row hashing; at 10^9 docs x 16 bands the old md5
    form was 1.6e10 interpreter calls). A 64-bit birthday collision at
    that scale merges a handful of buckets, which only ADDS candidate
    pairs that the downstream Jaccard verify rejects; the SQL oracle
    replays the identical key (``band_key_sql_expr``), so the compare
    is exact either way."""

    def __init__(self, bands: int = 16, rows: int = 4):
        self.bands = bands
        self.rows = rows

    def _keys_matrix(self, sigs: np.ndarray) -> np.ndarray:
        """(n, num_perm) signature block -> (n, bands) int64 keys."""
        n = sigs.shape[0]
        u = sigs.astype(np.uint64).reshape(n, self.bands, self.rows)
        C = np.uint64(_BAND_KEY_MULT)
        h = np.broadcast_to(np.arange(self.bands, dtype=np.uint64),
                            (n, self.bands)).copy()
        for j in range(self.rows):
            h *= C
            h += u[:, :, j]
        return h.view(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mh = batch.column("minhash")
        if isinstance(mh, pa.ChunkedArray):
            mh = mh.combine_chunks()
        n = len(mh)
        num_perm = self.bands * self.rows
        offs = np.asarray(mh.offsets)
        if n and len(offs) == n + 1 and offs[0] == 0 \
                and np.all(np.diff(offs) == num_perm):
            sigs = np.asarray(mh.values).reshape(n, num_perm)
            keys = self._keys_matrix(sigs)
            ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
            return pa.table({
                "band_key": pa.array(keys.reshape(-1), pa.int64()),
                "doc_id": pa.array(np.repeat(ids, self.bands), pa.int64()),
            })
        # ragged/empty fallback: row-at-a-time through the same mix
        sigs = mh.to_pylist()
        ids = batch.column("doc_id").to_pylist()
        out_key, out_id = [], []
        for doc_id, sig in zip(ids, sigs):
            row = np.asarray(sig, dtype=np.int64).reshape(1, num_perm)
            out_key.extend(self._keys_matrix(row)[0].tolist())
            out_id.extend([doc_id] * self.bands)
        return pa.table({
            "band_key": pa.array(out_key, pa.int64()),
            "doc_id": pa.array(out_id, pa.int64()),
        })


class SimHashStage:
    """64-bit SimHash over token hashes.

    Stateful: token md5s are cached per actor/worker (tokens repeat
    heavily in real corpora), and the per-doc accumulate is one
    vectorized reduceat over the whole batch."""

    def __init__(self):
        self._cache: dict = {}
        # per-distinct-token +-1 contribution rows. int16 so the hot
        # path is a PLAIN reduceat — the dtype=-casting form pays a
        # ~3 s one-time ufunc-setup cost per process.
        self._contrib = np.empty((0, 64), dtype=np.int16)
        self._n = 0
        self._gather_scratch = None

    def _token_rows(self, tokens) -> None:
        new = [t for t in dict.fromkeys(tokens) if t not in self._cache]
        if not new:
            return
        # little-endian first-8 bytes == DuckDB md5_number_upper
        hv = np.fromiter(
            (int.from_bytes(hashlib.md5(t.encode()).digest()[:8],
                            "little") for t in new),
            dtype=np.uint64, count=len(new))
        shifts = np.arange(64, dtype=np.uint64)
        bits = ((hv[:, None] >> shifts[None, :])
                & np.uint64(1)).astype(np.int16)
        rows = 2 * bits - 1
        need = self._n + len(new)
        if need > self._contrib.shape[0]:       # capacity doubling
            cap = max(need, 2 * self._contrib.shape[0], 1 << 15)
            nc = np.empty((cap, 64), np.int16)
            nc[:self._n] = self._contrib[:self._n]
            self._contrib = nc
        self._contrib[self._n:need] = rows
        base = self._n
        self._n = need
        for j, t in enumerate(new):
            self._cache[t] = base + j

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        doc_toks = [t.split() for t in texts]
        flat = [tok for toks in doc_toks for tok in toks]
        self._token_rows(flat)
        cache = self._cache
        idx = np.fromiter((cache[t] for t in flat), dtype=np.int64,
                          count=len(flat))
        lens = np.array([len(tk) for tk in doc_toks], dtype=np.int64)
        out = np.zeros(len(texts), dtype=np.int64)
        nz = np.flatnonzero(lens)
        if len(nz):
            if self._gather_scratch is None \
                    or self._gather_scratch.shape[0] < len(idx):
                cap = 1 << max(12, int(len(idx) - 1).bit_length())
                self._gather_scratch = np.empty((cap, 64), np.int16)
            contrib = self._gather_scratch[:len(idx)]
            np.take(self._contrib, idx, axis=0, out=contrib)
            offs = np.concatenate(([0], np.cumsum(lens)))[:-1]
            if lens.max() < 30000:
                acc = np.add.reduceat(contrib, offs[nz], axis=0)
            else:   # int16 sum could overflow on a >30k-token doc
                acc = np.add.reduceat(contrib.astype(np.int64),
                                      offs[nz], axis=0)
            shifts = np.arange(64, dtype=np.uint64)
            v = ((acc > 0).astype(np.uint64)
                 << shifts[None, :]).sum(axis=1).astype(np.uint64)
            out[nz] = v.view(np.int64)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "simhash": pa.array(out, pa.int64()),
        })


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    sa, sb = set(_shingles(text_a, k)), set(_shingles(text_b, k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


class DecontaminateStage:
    """Benchmark n-gram decontamination (the GPT-2/GPT-3-style
    held-out-overlap filter a training-data pipeline runs before
    training): count, per corpus document, how many DISTINCT
    whitespace n-grams also occur in a benchmark document set.

    100-TB shape: the benchmark side (eval sets) is MBs, the corpus is
    the 100 TB side — so the benchmark gram set is built once, shipped
    once via ``ray.put`` and materialized once per worker (this stage's
    ``__init__`` under stages.util.stage_fn); the corpus pass is one
    shuffle-free ``map_batches`` scan. If the small side ever outgrew a
    broadcast, the fallback is a gram-hash join (the q_jaccard_verify
    exchange pattern), not a bigger broadcast.

    Tokenization is a plain ``' '`` split so a SQL oracle (DuckDB
    string_split + list slicing) reproduces the gram strings exactly.
    """

    def __init__(self, bench_ref, n: int = 8):
        import ray
        bench = ray.get(bench_ref)
        self.bench = bench if isinstance(bench, set) else set(bench)
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = self.n
        ids = batch.column("doc_id").to_pylist()
        out_id = []
        out_cnt = []
        for doc_id, text in zip(ids, batch.column("text").to_pylist()):
            toks = text.split(" ")
            if len(toks) < n:
                continue
            grams = {" ".join(toks[i:i + n])
                     for i in range(len(toks) - n + 1)}
            hits = len(grams & self.bench)
            if hits:
                out_id.append(doc_id)
                out_cnt.append(hits)
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "n_contaminated": pa.array(out_cnt, pa.int64()),
        })


def benchmark_grams(texts, n: int = 8) -> set:
    """Distinct whitespace n-grams of the benchmark documents."""
    grams = set()
    for text in texts:
        toks = text.split(" ")
        for i in range(len(toks) - n + 1):
            grams.add(" ".join(toks[i:i + n]))
    return grams
