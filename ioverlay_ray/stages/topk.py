"""Grouped top-k: per-batch combiner -> per-group exact merge.

The classic distributed pattern for "top k rows per group by value":
every batch keeps at most k rows per group (map-side combine, so the
exchange moves at most k x groups-per-batch rows regardless of input
size), then one groupby(key).map_groups pass merges the partials and
emits the exact per-group top k with a dense rank.

Ties break by the caller's tie columns (ascending) so the result is
deterministic and matches a row_number() SQL oracle:
    row_number() OVER (PARTITION BY keys ORDER BY value DESC, tie...)

At 100 TB the exchange is k x |groups| rows total -- independent of
input row count; skewed groups cost nothing extra because the combine
already reduced every block to k rows per group.
"""

from __future__ import annotations

from typing import List, Optional

import pandas as pd
import pyarrow as pa


def _take_topk(df: pd.DataFrame, keys: List[str], value: str, k: int,
               descending: bool, tie_cols: List[str]) -> pd.DataFrame:
    by = [value] + tie_cols
    asc = [not descending] + [True] * len(tie_cols)
    df = df.sort_values(by, ascending=asc, kind="mergesort")
    return df.groupby(keys, as_index=False, sort=False).head(k)


def grouped_topk(ds, keys: List[str], value: str, k: int,
                 descending: bool = True,
                 tie_cols: Optional[List[str]] = None,
                 rank_col: str = "rnk"):
    """Exact top-k rows per group; adds ``rank_col`` (1-based).

    Returns a Dataset with the input columns plus the rank.
    """
    tie_cols = list(tie_cols or [])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = _take_topk(df, keys, value, k, descending, tie_cols)
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    def merge(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        out = _take_topk(df, keys, value, k, descending, tie_cols)
        out[rank_col] = out.groupby(keys, sort=False).cumcount() + 1
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(keys)
            .map_groups(merge, batch_format="pyarrow"))


def global_topk(ds, value: str, k: int, descending: bool = True,
                tie_cols: Optional[List[str]] = None) -> pd.DataFrame:
    """Exact global top-k WITHOUT a full sort shuffle: every block
    keeps its own top k (map-side combine), and only the tiny
    k-rows-per-block partials are collected and merged. The exchange
    is k x num_blocks rows -- independent of input row count -- vs a
    global ``ds.sort`` which moves every block all-to-all.
    """
    tie_cols = list(tie_cols or [])
    by = [value] + tie_cols
    asc = [not descending] + [True] * len(tie_cols)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = df.sort_values(by, ascending=asc, kind="mergesort").head(k)
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return (parts.sort_values(by, ascending=asc, kind="mergesort")
            .head(k).reset_index(drop=True))
