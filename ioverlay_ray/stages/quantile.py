"""Exact grouped quantiles by streaming histogram refinement — no
shuffle, no per-group sort, no materialization of the value column.

quantile_disc semantics (DuckDB / numpy inverted_cdf): the q-quantile
of a group of n values is its k-th smallest element, k = ceil(q*n).

Passes (each a map_batches partial + tiny driver merge; the data never
moves, only fixed-size summaries do):

  1. per-group (count, min, max)
  2. repeat <= max_rounds: per active (group, q) target, a B-bucket
     histogram of the group's values inside the target's current
     [lo, hi] interval; the bucket containing the k-th rank narrows
     the interval and rebases the rank. Stop when the bucket holds
     <= gather_limit values.
  3. one gather pass collects the few in-interval values per target;
     the exact k-th smallest is selected driver-side.

Bucket edges are an explicit np.linspace array shared between the
histogram call and the narrowing step, so boundary values can never be
counted on one side and masked on the other (np.histogram's integer-
bins fast path computes edges slightly differently than linspace).

Cost: O(rounds) streaming passes over one column; summary size is
B x |groups x qs| ints. At 100 TB this is the textbook way to get
EXACT percentiles without sorting — every pass is embarrassingly
parallel and the driver state is kilobytes. Ties/duplicates are fine:
when an interval stops shrinking (all remaining values equal) that
value IS the answer.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

Target = Tuple[object, float, float]  # (group value, lo, hi)


def _group_stats(ds, key: str, value: str) -> pd.DataFrame:
    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(key, as_index=False).agg(
            n=(value, "size"), lo=(value, "min"), hi=(value, "max"))
        return pa.Table.from_pandas(
            g, preserve_index=False).replace_schema_metadata(None)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return parts.groupby(key, as_index=False).agg(
        n=("n", "sum"), lo=("lo", "min"), hi=("hi", "max"))


class _HistStage:
    """Per-batch histograms for every active (group, q) target."""

    def __init__(self, key: str, value: str, targets: List[Target],
                 bins: int):
        self.key = key
        self.value = value
        self.targets = targets
        self.edges = [np.linspace(lo, hi, bins + 1)
                      for _, lo, hi in targets]

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key).to_pandas().to_numpy()
        vals = batch.column(self.value).to_numpy(zero_copy_only=False)
        ids, hists = [], []
        for t_id, (gval, lo, hi) in enumerate(self.targets):
            m = (keys == gval) & (vals >= lo) & (vals <= hi)
            if not m.any():
                continue
            h, _ = np.histogram(vals[m], bins=self.edges[t_id])
            ids.append(t_id)
            hists.append(h.astype(np.int64).tolist())
        return pa.table({"t_id": pa.array(ids, pa.int64()),
                         "hist": pa.array(hists,
                                          pa.list_(pa.int64()))})


class _GatherStage:
    def __init__(self, key: str, value: str, targets: List[Target]):
        self.key = key
        self.value = value
        self.targets = targets

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key).to_pandas().to_numpy()
        vals = batch.column(self.value).to_numpy(zero_copy_only=False)
        out_t: List[int] = []
        out_v: List[float] = []
        for t_id, (gval, lo, hi) in enumerate(self.targets):
            m = (keys == gval) & (vals >= lo) & (vals <= hi)
            if m.any():
                v = vals[m]
                out_t.extend([t_id] * len(v))
                out_v.extend(v.tolist())
        return pa.table({"t_id": pa.array(out_t, pa.int64()),
                         "val": pa.array(out_v, pa.float64())})


def exact_grouped_quantiles(ds, key: str, value: str, qs: List[float],
                            bins: int = 4096, gather_limit: int = 65536,
                            max_rounds: int = 6) -> pd.DataFrame:
    """Exact quantile_disc per group for every q in ``qs``.

    Returns a DataFrame with columns [key, "q", "value"]. ``ds`` is
    iterated ``2 + rounds`` times (pass a cached/materialized Dataset
    to stream the passes from the object store instead of storage).
    """
    stats = _group_stats(ds, key, value)

    targets: List[Target] = []
    ranks: List[int] = []
    labels: List[Tuple[object, float]] = []
    solved: Dict[int, float] = {}
    for _, row in stats.iterrows():
        for q in qs:
            t_id = len(targets)
            targets.append((row[key], float(row["lo"]),
                            float(row["hi"])))
            ranks.append(max(1, math.ceil(q * row["n"])))
            labels.append((row[key], q))
            if row["lo"] == row["hi"]:
                solved[t_id] = float(row["lo"])

    counts: Dict[int, int] = {}

    for _ in range(max_rounds):
        active = [t for t in range(len(targets))
                  if t not in solved
                  and counts.get(t, gather_limit + 1) > gather_limit]
        if not active:
            break
        sub = [targets[t] for t in active]
        stage = _HistStage(key, value, sub, bins)
        hists = ds.map_batches(stage,
                               batch_format="pyarrow").to_pandas()
        merged = np.zeros((len(sub), bins), dtype=np.int64)
        for _, r in hists.iterrows():
            merged[int(r["t_id"])] += np.asarray(r["hist"], np.int64)
        for i, t in enumerate(active):
            gval = targets[t][0]
            h = merged[i]
            c = np.cumsum(h)
            b = int(np.searchsorted(c, ranks[t]))
            prev = int(c[b - 1]) if b > 0 else 0
            edges = stage.edges[i]
            new_lo = float(edges[b])
            new_hi = float(edges[b + 1])
            ranks[t] -= prev
            counts[t] = int(h[b])
            if counts[t] == 0 or new_lo >= new_hi:
                solved[t] = new_lo
            elif targets[t][1] == new_lo and targets[t][2] == new_hi:
                # interval no longer shrinks: remaining values are
                # FP-indistinguishable; gather will finish it
                counts[t] = 0
                targets[t] = (gval, new_lo, new_hi)
            else:
                targets[t] = (gval, new_lo, new_hi)

    pending = [t for t in range(len(targets)) if t not in solved]
    if pending:
        sub = [targets[t] for t in pending]
        got = ds.map_batches(_GatherStage(key, value, sub),
                             batch_format="pyarrow").to_pandas()
        for i, t in enumerate(pending):
            v = got.loc[got["t_id"] == i, "val"].to_numpy()
            if len(v) == 0:
                solved[t] = targets[t][1]
            else:
                k = min(ranks[t], len(v))
                solved[t] = float(np.partition(v, k - 1)[k - 1])

    return pd.DataFrame({
        key: [labels[t][0] for t in range(len(targets))],
        "q": [labels[t][1] for t in range(len(targets))],
        "value": [solved[t] for t in range(len(targets))],
    })
