"""H3-style spatial cell keys (square-grid analog) + skew handling.

The partition key for every wide spatial operation. A cell id packs
(resolution, ix, iy) into one int64 so datasets can groupby/shuffle on a
single column. Mirrors the role of the reference's power-of-two x-bin
GridLayout (split/grid_layout.rs:251-297) generalized to 2-D, with
explicit salting of hot cells (BASELINE.json north_rule).
"""

from __future__ import annotations

import numpy as np

BASE_RES = 12  # cell side = 2^BASE_RES world units at resolution 0


def cell_size(resolution: int) -> int:
    """Side length of a cell; higher resolution -> smaller cells."""
    return 1 << max(1, BASE_RES + 10 - resolution)


def cell_id(x: np.ndarray, y: np.ndarray, resolution: int) -> np.ndarray:
    """Pack (resolution, ix, iy) -> int64. Vectorized."""
    size = cell_size(resolution)
    ix = np.floor_divide(np.asarray(x, np.int64), size) & 0xFFFFFF
    iy = np.floor_divide(np.asarray(y, np.int64), size) & 0xFFFFFF
    return (np.int64(resolution) << 48) | (ix.astype(np.int64) << 24) | iy.astype(np.int64)


def cell_of_bbox(xmin, ymin, xmax, ymax, resolution: int) -> np.ndarray:
    """Cell of the bbox center (the home cell for small geometries)."""
    cx = (np.asarray(xmin, np.int64) + np.asarray(xmax, np.int64)) // 2
    cy = (np.asarray(ymin, np.int64) + np.asarray(ymax, np.int64)) // 2
    return cell_id(cx, cy, resolution)


def cells_covering_bbox(xmin: int, ymin: int, xmax: int, ymax: int,
                        resolution: int) -> list:
    """All cells overlapped by a bbox (for fragmentation / join fan-out)."""
    size = cell_size(resolution)
    out = []
    iy0, iy1 = ymin // size, ymax // size
    ix0, ix1 = xmin // size, xmax // size
    for ix in range(ix0, ix1 + 1):
        for iy in range(iy0, iy1 + 1):
            out.append((resolution << 48) | ((ix & 0xFFFFFF) << 24)
                       | (iy & 0xFFFFFF))
    return out


def ring_cells(cell: int, k: int) -> list:
    """Cells within Chebyshev distance k (H3 ring analog, for kNN
    expansion)."""
    res = cell >> 48
    ix = (cell >> 24) & 0xFFFFFF
    iy = cell & 0xFFFFFF
    out = []
    for dx in range(-k, k + 1):
        for dy in range(-k, k + 1):
            out.append((res << 48) | (((ix + dx) & 0xFFFFFF) << 24)
                       | ((iy + dy) & 0xFFFFFF))
    return out


def salt_hot_cells(tile_ids: np.ndarray, counts_threshold: int = 20000,
                   salt_bits: int = 4) -> np.ndarray:
    """Split cells with more rows than the threshold into 2^salt_bits
    salted sub-keys so one hot cell doesn't serialize a whole stage.
    Deterministic: salt = row index within cell modulo fan-out."""
    ids = np.asarray(tile_ids, np.int64)
    uniq, inverse, counts = np.unique(ids, return_inverse=True,
                                      return_counts=True)
    hot = counts[inverse] > counts_threshold
    if not hot.any():
        return ids
    # per-row ordinal within its cell
    order = np.argsort(inverse, kind="stable")
    inv_sorted = inverse[order]
    group_starts = np.concatenate(([0], np.cumsum(counts[:-1])))
    ords = np.arange(len(ids), dtype=np.int64) - group_starts[inv_sorted]
    ordinal = np.empty(len(ids), np.int64)
    ordinal[order] = ords
    salted = ids | ((ordinal % (1 << salt_bits)) << 56)
    return np.where(hot, salted, ids)
