"""Distributed as-of join (point-in-time lookup).

The classic market-data / feature-store operator Ray Data lacks
natively: for each left row (key, t), find the most recent right row
(key, t_r <= t). Expressed Ray-Data-first as a hash-partitioned
co-group — both sides are tagged, unioned, exchanged once on
key % P, and each partition runs a fully vectorized merge:

  right sorted by (key, t, id); left ranks into it with ONE global
  searchsorted over rank-packed int64 keys (key * K + time_rank), so
  the per-partition work is O((l + r) log r) numpy with no Python
  loop over rows.

Ties on (key, t) resolve to the largest right id — matching the SQL
window `ORDER BY t DESC, id DESC` oracle exactly. Payload columns are
int64 (cast timestamps/money to integer units upstream).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pyarrow as pa


def asof_join(left_ds, right_ds, *, left_key: str, left_t: str,
              right_key: str, right_t: str, right_id: str,
              left_cols: Dict[str, str], right_cols: Dict[str, str],
              num_partitions: int = 32):
    """Left rows joined to the most recent right row per key.

    left_cols / right_cols map output name -> source column (int64able).
    Returns a Dataset with those columns for every MATCHED left row.
    """
    l_out = list(left_cols)
    r_out = list(right_cols)
    all_out = l_out + r_out

    def tag(side, key_c, t_c, id_c, keep):
        def fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            key = batch.column(key_c).cast(pa.int64())
            tcol = batch.column(t_c)
            if pa.types.is_timestamp(tcol.type):
                tcol = tcol.cast(pa.timestamp("us"))
            knp = key.to_numpy(zero_copy_only=False).astype(np.int64)
            cols = {
                "__side": pa.array(np.full(n, side, np.int8)),
                "__key": key,
                "__t": tcol.cast(pa.int64()),
                "__rid": (batch.column(id_c).cast(pa.int64()) if id_c
                          else pa.array(np.zeros(n, np.int64))),
                "__part": pa.array(knp % num_partitions, pa.int64()),
            }
            for out in all_out:
                src = keep.get(out)
                cols[out] = (batch.column(src).cast(pa.int64())
                             if src is not None else pa.nulls(n, pa.int64()))
            return pa.table(cols)
        return fn

    lt = left_ds.map_batches(tag(0, left_key, left_t, None, left_cols),
                             batch_format="pyarrow")
    rt = right_ds.map_batches(tag(1, right_key, right_t, right_id,
                                  right_cols),
                              batch_format="pyarrow")
    both = lt.union(rt)

    def merge(group: pa.Table) -> pa.Table:
        side = group.column("__side").to_numpy(zero_copy_only=False)
        key = group.column("__key").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        t = group.column("__t").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        left = np.flatnonzero(side == 0)
        right = np.flatnonzero(side == 1)
        if len(left) == 0 or len(right) == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in all_out})

        r_key = key[right]
        r_t = t[right]
        r_id = group.column("__rid").to_numpy(zero_copy_only=False) \
            .astype(np.int64)[right]
        order = np.lexsort((r_id, r_t, r_key))
        r_key = r_key[order]
        r_t = r_t[order]
        r_rows = right[order]

        all_t = np.unique(r_t)
        K = np.int64(len(all_t) + 2)
        kmax = max(int(key.max()), 1)
        if kmax * int(K) >= (1 << 62):
            raise ValueError(
                "asof_join rank-pack overflow: key range x distinct "
                "right timestamps exceeds int64; raise num_partitions "
                "so each partition holds fewer distinct times")
        r_pack = r_key * K + np.searchsorted(all_t, r_t).astype(np.int64)
        l_key = key[left]
        l_pack = l_key * K + np.searchsorted(
            all_t, t[left], side="right").astype(np.int64)
        pos = np.searchsorted(r_pack, l_pack, side="left") - 1
        ok = pos >= 0
        okp = np.where(ok, pos, 0)
        ok &= r_key[okp] == l_key
        l_sel = pa.array(left[ok], pa.int64())
        r_sel = pa.array(r_rows[pos[ok]], pa.int64())

        cols = {}
        for c in l_out:
            cols[c] = group.column(c).take(l_sel)
        for c in r_out:
            cols[c] = group.column(c).take(r_sel)
        return pa.table(cols)

    return both.groupby("__part").map_groups(merge, batch_format="pyarrow")
