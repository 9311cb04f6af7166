"""Sketch primitives for 100-TB-shaped scans: KMV distinct-count,
mergeable Misra-Gries heavy hitters, and Bloom-filter broadcast
semi-join prefilters.

All three share the same scale shape: ONE shuffle-free pass over the
big table producing a tiny per-block partial (k hashes / m counters /
an m-bit bitmap) reduced through Ray Data AggregateFn merges — never
an all-to-all exchange on the raw rows. Exactness is restored where it
matters: heavy hitters get a second exact-count pass restricted to the
candidate set, and the Bloom prefilter is followed by an exact hash
semi-join on the (much smaller) survivor set, so query results are
exact even though the sketches are approximate.

Hashing uses a single 64-bit multiplicative mix (odd constant, a
bijection mod 2^64) so the DuckDB oracles can replay the identical
hash in HUGEINT arithmetic — same trick as the LSH band key
(`stages/dedup.band_key_sql_expr`).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

#: odd 64-bit multiplier (2^64 / golden ratio): a bijection mod 2^64,
#: so distinct keys always map to distinct hashes (KMV never undercounts
#: from hash collisions) while the high bits are well mixed.
MIX_MULT = 0x9E3779B97F4A7C15  # 11400714819323198485

_U64 = np.uint64(2**64 - 1)  # noqa: F841  (documentation of the domain)


def mix64(vals: np.ndarray) -> np.ndarray:
    """uint64 multiplicative mix; wraps mod 2^64 like the SQL replay
    ``(CAST(v AS HUGEINT) * 11400714819323198485) % 2^64``."""
    return vals.astype(np.uint64) * np.uint64(MIX_MULT)


def mix64_sql_expr(col: str) -> str:
    """DuckDB expression reproducing :func:`mix64` as unsigned HUGEINT."""
    return (f"(CAST({col} AS HUGEINT) * {MIX_MULT})"
            " % 18446744073709551616")


# ---------------------------------------------------------------------------
# KMV (k minimum values) distinct-count sketch
# ---------------------------------------------------------------------------

def kmv_distinct(ds, col: str, k: int = 64) -> pd.DataFrame:
    """Estimate COUNT(DISTINCT col) with a k-minimum-values sketch in
    ONE shuffle-free pass, expressed as a Ray Data ``AggregateFn``:
    each block accumulates into a k-value sketch (k * 8 bytes) and
    sketches MERGE pairwise (union -> k smallest), so driver state is
    O(k) — never a take_all of per-block partial rows (at 10^6 blocks
    that would be 10^6 * k rows driver-side).

    The kth smallest global distinct hash necessarily lies within some
    block's local k smallest, so the merged sketch is exact-by-
    construction (k-min-set union is associative); with fewer than k
    distinct hashes overall the sketch degenerates to the exact
    distinct count. Estimator (uniform order statistics):
    est = (k-1) * 2^64 / h_(k), floor division so the DuckDB HUGEINT
    replay is bit-identical.

    Returns one row: {k, n_kept, kth_hash, est_distinct} (kth_hash is
    the uint64 value wrapped to signed int64 for Arrow/pandas).
    """
    from ray.data.aggregate import AggregateFn

    def acc_block(state: np.ndarray, block) -> np.ndarray:
        v = block.column(col).to_numpy(zero_copy_only=False)
        h = np.unique(mix64(np.asarray(v, dtype=np.int64)))[:k]
        return np.unique(np.concatenate([state, h]))[:k]

    fn = AggregateFn(
        init=lambda key: np.empty(0, np.uint64),
        merge=lambda a, b: np.unique(np.concatenate([a, b]))[:k],
        accumulate_block=acc_block, name="kmv")
    res = ds.aggregate(fn)
    merged = res["kmv"] if res else np.empty(0, np.uint64)
    n_kept = min(k, len(merged))
    if len(merged) == 0:
        kth, est = 0, 0
    elif len(merged) < k:
        kth = int(merged[-1])
        est = int(len(merged))
    else:
        kth = int(merged[k - 1])
        est = ((k - 1) * (1 << 64)) // kth
    return pd.DataFrame({
        "k": np.array([k], np.int64),
        "n_kept": np.array([n_kept], np.int64),
        "kth_hash": np.array([kth], np.uint64).view(np.int64),
        "est_distinct": np.array([est], np.int64),
    })


# ---------------------------------------------------------------------------
# Mergeable Misra-Gries heavy hitters (exact via a second pass)
# ---------------------------------------------------------------------------

def _mg_trim(keys: np.ndarray, counts: np.ndarray,
             m: int) -> Tuple[np.ndarray, np.ndarray]:
    """Misra-Gries trim: subtract the (m+1)-th largest count from all
    counters and keep the positive ones (<= m survive). Applying this
    to EXACT per-block counts yields that block's MG(m) summary, and
    re-applying it to summed summaries is the standard mergeable-
    summaries merge (total undercount <= N/(m+1))."""
    if len(keys) <= m:
        return keys, counts
    kth = np.partition(counts, len(counts) - (m + 1))[len(counts) - (m + 1)]
    adj = counts - kth
    keep = adj > 0
    return keys[keep], adj[keep]


def heavy_hitters(ds, col: str, phi_num: int, phi_den: int,
                  safety: int = 4) -> pd.DataFrame:
    """Exact phi-heavy hitters (keys with count >= ceil(phi * N),
    phi = phi_num/phi_den as EXACT integer arithmetic so a SQL oracle
    reproduces the threshold bit-for-bit) in two shuffle-free passes,
    each a Ray Data ``AggregateFn`` whose state is O(m):
    (1) per-block exact counts trimmed to Misra-Gries summaries of
    capacity m = ceil(safety/phi), merged PAIRWISE (sum + trim — the
    standard mergeable-summaries merge, total undercount <= N/(m+1)
    for any merge tree) with the row count folded into the same state,
    so every key with true count > N/(m+1) < phi*N survives as a
    candidate with NO false negatives; (2) exact counts for the <= m
    candidates only (broadcast sorted key array, per-block filtered
    bincount, pairwise vector adds). Neither pass exchanges raw rows
    or materializes per-block partials on the driver.

    Returns {col, n} for qualifying keys, exact counts.
    """
    from ray.data.aggregate import AggregateFn

    m = (safety * phi_den + phi_num - 1) // phi_num
    empty = np.empty(0, np.int64)

    def mg_acc(state, block):
        keys, counts, n = state
        v = np.asarray(block.column(col).to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        bk, bc = np.unique(v, return_counts=True)
        return mg_merge((keys, counts, n),
                        (bk, bc.astype(np.int64), len(v)))

    def mg_merge(a, b):
        uk, inv = np.unique(np.concatenate([a[0], b[0]]),
                            return_inverse=True)
        uc = np.bincount(inv, weights=np.concatenate([a[1], b[1]]),
                         minlength=len(uk)).astype(np.int64)
        tk, tc = _mg_trim(uk, uc, m)
        return (tk, tc, a[2] + b[2])

    fn1 = AggregateFn(init=lambda key: (empty, empty, 0),
                      merge=mg_merge, accumulate_block=mg_acc, name="mg")
    res = ds.aggregate(fn1)
    if not res:
        return pd.DataFrame({col: pd.Series([], dtype=np.int64),
                             "n": pd.Series([], dtype=np.int64)})
    cand_keys, _, n_total = res["mg"]
    thresh = (phi_num * n_total + phi_den - 1) // phi_den
    cand_arr = np.sort(np.asarray(cand_keys, dtype=np.int64))
    cand_ref = ray.put(cand_arr)
    nc = len(cand_arr)

    def exact_acc(state, block):
        cand = ray.get(cand_ref)
        if not len(cand):
            return state
        v = np.asarray(block.column(col).to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        pos = np.searchsorted(cand, v)
        pos_c = np.minimum(pos, len(cand) - 1)
        hit = cand[pos_c] == v
        return state + np.bincount(pos_c[hit], minlength=len(cand)) \
            .astype(np.int64)

    fn2 = AggregateFn(init=lambda key: np.zeros(nc, np.int64),
                      merge=lambda a, b: a + b,
                      accumulate_block=exact_acc, name="hh")
    counts = ds.aggregate(fn2)["hh"]
    ok = counts >= thresh
    return pd.DataFrame({col: cand_arr[ok],
                         "n": counts[ok]}).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Bloom filter: build (AggregateFn OR-reduction) + probe
# ---------------------------------------------------------------------------

#: probe multipliers: distinct odd constants (odd + 2i*odd stays odd)
def _bloom_mults(k: int) -> List[int]:
    return [(MIX_MULT + 2 * i * 0xC2B2AE3D27D4EB4F) % (1 << 64) | 1
            for i in range(k)]


def _bloom_positions(vals: np.ndarray, log2_m: int,
                     mults: List[int]) -> List[np.ndarray]:
    shift = np.uint64(64 - log2_m)
    u = vals.astype(np.uint64)
    return [(u * np.uint64(c)) >> shift for c in mults]


def build_bloom(ds, col: str, log2_m: int = 20, k: int = 4) -> np.ndarray:
    """Build an m = 2^log2_m - bit Bloom filter over ``ds[col]`` as a
    Ray Data ``AggregateFn`` whose state is ONE m-bit word array
    (m/8 bytes, e.g. 128 KB at 2^20 bits): blocks OR their key bits
    into the accumulator in place and partial states OR pairwise, so
    no process (driver included) ever holds more than O(m) bitmap
    bytes at once, regardless of the number of blocks.
    Returns the filter as a uint64 word array (m/64 words)."""
    from ray.data.aggregate import AggregateFn

    mults = _bloom_mults(k)
    n_words = (1 << log2_m) // 64

    def acc_block(words: np.ndarray, block) -> np.ndarray:
        v = np.asarray(block.column(col).to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        for pos in _bloom_positions(v, log2_m, mults):
            np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (pos & np.uint64(63)))
        return words

    fn = AggregateFn(init=lambda key: np.zeros(n_words, np.uint64),
                     merge=lambda a, b: a | b,
                     accumulate_block=acc_block, name="bloom")
    res = ds.aggregate(fn)
    return res["bloom"] if res else np.zeros(n_words, np.uint64)


def bloom_mask(vals: np.ndarray, words: np.ndarray, log2_m: int,
               k: int) -> np.ndarray:
    """Vectorized membership probe: True where ALL k bits are set
    (supersets the true membership -- no false negatives)."""
    ok = np.ones(len(vals), bool)
    for pos in _bloom_positions(np.asarray(vals, dtype=np.int64),
                                log2_m, _bloom_mults(k)):
        w = words[(pos >> np.uint64(6)).astype(np.int64)]
        ok &= (w >> (pos & np.uint64(63))) & np.uint64(1) != 0
    return ok
