"""Arrow <-> kernel geometry conversion.

At-rest geometry is the nested Arrow list layout (SURVEY.md §1.3):
  shape:  list<contour>, contour: list<point>, point: list<int64>[2]
A multipolygon (IntShapes) adds one more nesting level. The flat
list-offset layout is exactly iOverlay's FlatContoursBuffer
(core/overlay.rs:250-255) mapped onto Arrow offsets.
"""

from __future__ import annotations

import pyarrow as pa

POINT = pa.list_(pa.int64(), 2)
CONTOUR = pa.list_(POINT)
SHAPE = pa.list_(CONTOUR)       # polygon with holes
SHAPES = pa.list_(SHAPE)        # multipolygon


def shape_to_py(value) -> list:
    """Arrow nested value -> list of contours of (x, y) tuples."""
    if value is None:
        return []
    return [[(int(p[0]), int(p[1])) for p in contour] for contour in value]


def shapes_to_py(value) -> list:
    if value is None:
        return []
    return [shape_to_py(s) for s in value]


def shapes_array(rows: list) -> pa.Array:
    """list of multipolygons (list of shapes of contours of tuples) ->
    Arrow array."""
    return pa.array(
        [[[[list(p) for p in c] for c in s] for s in row] for row in rows],
        type=SHAPES)


def shape_array(rows: list) -> pa.Array:
    return pa.array(
        [[[list(p) for p in c] for c in s] for s in rows], type=SHAPE)


def shape_column_flat(col):
    """SHAPE-typed Arrow column -> (xs, ys, contour_offsets, row_of_
    contour) numpy views, zero-copy from the Arrow buffers (the flat
    interchange surface: no Python point lists).

    contour_offsets has one entry per contour + 1; row_of_contour maps
    each contour to its source row index."""
    import numpy as np
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = col
    # level 0: row -> contours
    off0 = np.asarray(arr.offsets)
    contours = arr.values          # list<POINT>
    off1 = np.asarray(contours.offsets)
    points = contours.values       # fixed_size_list<int64, 2> or list
    if pa.types.is_fixed_size_list(points.type):
        vals = np.asarray(points.values)
    else:
        vals = np.asarray(points.flatten())
    nrows = len(arr)
    c0 = off0[0]
    c1 = off0[nrows]
    row_of_contour = np.repeat(np.arange(nrows, dtype=np.int64),
                               np.diff(off0).astype(np.int64))
    offs = (off1[c0:c1 + 1] - off1[c0]).astype(np.int64)
    p0 = off1[c0]
    p1 = off1[c1]
    xs = vals[2 * p0:2 * p1:2].astype(np.int64, copy=False)
    ys = vals[2 * p0 + 1:2 * p1:2].astype(np.int64, copy=False)
    return xs, ys, offs, row_of_contour


def shapes_area2(shapes: list) -> int:
    """Twice the signed area summed over all contours (hole contours have
    opposite orientation, so holes subtract)."""
    total = 0
    for shape in shapes:
        for contour in shape:
            n = len(contour)
            for i in range(n):
                x0, y0 = contour[i - 1]
                x1, y1 = contour[i]
                total += x0 * y1 - x1 * y0
    return total
