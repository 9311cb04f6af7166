"""Raster-tile <-> vector clipping stages.

The raster side of an image is a stack of horizontal scanlines; vector
clipping a polygon against them goes through the string kernel
(geometry/string_ops.py): each scanline is an open polyline clipped by
the polygon, giving exact covered intervals per pixel row. Coordinates
are doubled so scanlines run at pixel centers (y + 1/2 -> 2y + 1) and
never hit polygon vertices, matching the reference clip semantics for
lines in general position (string/clip.rs).
"""

from __future__ import annotations

import pyarrow as pa

from ..geometry.string_ops import clip_paths
from . import geo_arrow


def scanline_coverage(shape: list, x0: int, x1: int, ys):
    """Covered length of ``shape`` (contours, int coords) along each
    scanline y + 1/2 for y in ``ys``, within [x0, x1]; exact
    doubled-coordinate clip.

    Returns (rows, covered_2x): covered length in DOUBLED units per row.
    """
    dshape = [[(2 * x, 2 * y) for x, y in c] for c in shape]
    rows, covered = [], []
    for y in ys:
        line = [[(2 * x0 - 1, 2 * y + 1), (2 * x1 + 1, 2 * y + 1)]]
        pieces = clip_paths(dshape, line, "nonzero")
        total = sum(abs(p[-1][0] - p[0][0]) for p in pieces)
        rows.append(y)
        covered.append(total)
    return rows, covered


class ScanlineRasterStage:
    """Annotated image rows -> per-image rasterized coverage of the star
    polygon over its footprint: n_covered_rows + total covered length,
    via one string-kernel clip per pixel row (actor-pool stage)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_rows, out_cov = [], [], []
        subs = batch.column("subj").to_pylist()
        clips = batch.column("clip").to_pylist()
        pair_ids = batch.column("pair_id").to_pylist()
        for pid, foot, star in zip(pair_ids, subs, clips):
            foot = geo_arrow.shape_to_py(foot)
            star = geo_arrow.shape_to_py(star)
            (fx0, fy0), (fx1, fy1) = foot[0][0], foot[0][2]
            # sample at most 16 scanlines per image to bound per-row work
            step = max(1, (fy1 - fy0) // 16)
            rows, cov = scanline_coverage(
                star, fx0, fx1, range(fy0, fy1, step))
            out_id.append(pid)
            out_rows.append(sum(1 for c in cov if c > 0))
            out_cov.append(int(sum(cov)))
        return pa.table({
            "pair_id": pa.array(out_id, pa.int64()),
            "covered_rows": pa.array(out_rows, pa.int64()),
            "covered_len2": pa.array(out_cov, pa.int64()),
        })
