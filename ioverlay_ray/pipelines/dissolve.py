"""Tile-distributed dissolve (N-way polygon union).

The distributed analog of the reference's fragment solver + simplify
union (split/solver_fragment.rs:18-80 grid partitioning;
core/simplify.rs N-way union, README.md:579-595), re-expressed as a
quad-tree hierarchical reduce over Ray Data:

1. Every polygon is assigned to the SMALLEST grid cell that fully
   contains its bbox (power-of-two cell sizes, like GridLayout's
   power-of-two x-bins, split/grid_layout.rs:251-297). Small shapes land
   in fine cells; only boundary-crossing shapes ride up the hierarchy.
2. For each level from finest to coarsest: ``groupby(cell).map_groups``
   unions each cell's shapes worker-locally with the boolean kernel and
   re-emits the result keyed by the PARENT cell one level up.
3. The root union touches only what crosses coarse boundaries.

Scale properties: the reduce depth is log2(world/base_cell); each level
is embarrassingly parallel across cells; the shuffle volume shrinks
geometrically per level because unions merge geometry. Skewed cells are
bounded by `max_group_rows` — oversized groups union in chunks
(combiner) before the final per-cell union, the groupby-side analog of
salting (SURVEY.md §4). Two short-circuits keep shallow data cheap:
empty levels are skipped entirely (one histogram pass), and once every
input level has been absorbed, merged shapes strictly interior to their
cell are emitted as FINAL instead of riding every remaining shuffle —
for small-object corpora the bulk of the data exits after round one.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..geometry.overlay import simplify_shape
from ..stages.geo_arrow import shapes_area2

RINGS = pa.list_(pa.list_(pa.int64()))  # shape = rings, ring = flat x,y pairs


def rings_to_shape(rings) -> list:
    return [list(zip(r[0::2], r[1::2])) for r in rings]


def shape_to_rings(shape) -> list:
    return [[int(v) for p in contour for v in p] for contour in shape]


def smallest_cell(x0, y0, x1, y1, base: int, levels: int):
    """(level, cell_id) per bbox; level 0 = finest (cell size ``base``),
    level ``levels-1`` = coarsest. Returns the finest level at which the
    bbox fits inside one cell, else the coarsest cell it overlaps."""
    x0 = np.asarray(x0, np.int64)
    y0 = np.asarray(y0, np.int64)
    x1 = np.asarray(x1, np.int64) - 1  # inclusive max corner
    y1 = np.asarray(y1, np.int64) - 1
    level = np.full(len(x0), levels - 1, dtype=np.int64)
    cell = np.zeros(len(x0), dtype=np.int64)
    done = np.zeros(len(x0), dtype=bool)
    for lev in range(levels):
        size = base << lev
        cx0 = x0 >> (size.bit_length() - 1)
        cy0 = y0 >> (size.bit_length() - 1)
        fits = (~done) & (cx0 == (x1 >> (size.bit_length() - 1))) & \
               (cy0 == (y1 >> (size.bit_length() - 1)))
        if lev == levels - 1:
            # coarsest level is a single root cell: geometry spanning
            # multiple coarse cells must union globally
            fits = ~done
            level[fits] = lev
            cell[fits] = 0
            done |= fits
            break
        level[fits] = lev
        cell[fits] = (cx0[fits] << 20) | (cy0[fits] & 0xFFFFF)
        done |= fits
        if done.all():
            break
    return level, cell


def parent_cell(cell: np.ndarray) -> np.ndarray:
    cx = cell >> 20
    cy = cell & 0xFFFFF
    return ((cx >> 1) << 20) | ((cy >> 1) & 0xFFFFF)


def _bbox_components(shapes: List[list]) -> List[List[int]]:
    """Union-find over bbox overlap: shapes whose bboxes are disjoint
    cannot interact, so each component unions independently (the
    fragment-rect pruning idea, split/grid_layout.rs:17-249)."""
    boxes = []
    for s in shapes:
        xs = [p[0] for c in s for p in c]
        ys = [p[1] for c in s for p in c]
        boxes.append((min(xs), min(ys), max(xs), max(ys)))
    return _boxes_components(boxes)


def _boxes_components(boxes: List[tuple]) -> List[List[int]]:
    """Transitive bbox-overlap components of a list of (x0,y0,x1,y1)
    boxes via an x-sweep union-find."""
    n = len(boxes)
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    order = sorted(range(n), key=lambda i: boxes[i][0])
    active: List[int] = []
    for i in order:
        x0, y0, x1, y1 = boxes[i]
        nxt = []
        for j in active:
            if boxes[j][2] < x0:
                continue  # expired in x
            nxt.append(j)
            if not (boxes[j][1] > y1 or boxes[j][3] < y0):
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[ri] = rj
        nxt.append(i)
        active = nxt
    comps: dict = {}
    for i in range(n):
        comps.setdefault(find(i), []).append(i)
    return list(comps.values())


def _union_rows(rows: List[list]) -> List[list]:
    """Union a list of shapes (each = list of contours) via the kernel,
    decomposed into bbox-overlap components first so disjoint geometry
    costs O(n log n) instead of feeding one giant overlay."""
    if len(rows) <= 1:
        return list(rows)
    out: List[list] = []
    for comp in _bbox_components(rows):
        if len(comp) == 1:
            out.append(rows[comp[0]])
        else:
            contours = [c for i in comp for c in rows[i]]
            out.extend(simplify_shape(contours, "nonzero"))
    return out


def _union_chunked(shapes: List[list], max_group_rows: int) -> List[list]:
    """Chunked combiner for skewed cells: pre-union in bounded chunks
    so peak segment count stays bounded (the salting analog); stop if a
    pass makes no progress (disjoint shapes never merge)."""
    while len(shapes) > max_group_rows:
        before = len(shapes)
        chunks = [shapes[i:i + max_group_rows]
                  for i in range(0, len(shapes), max_group_rows)]
        shapes = [s for ch in chunks for s in _union_rows(ch)]
        if len(shapes) >= before:
            break
    return _union_rows(shapes)


# Above this many pre-root rows the driver-side bbox union-find is
# skipped (the bbox table would be driver-resident) and the salted
# pre-union + single root task handle the tail instead — the same
# bounded-driver pattern as tiled_overlay.DRIVER_MARKS_CAP.
DRIVER_COMPONENTS_CAP = 1 << 19


def _batch_bboxes(batch: pa.Table):
    """Per-row (x0, y0, x1, y1) straight off the RINGS Arrow buffers
    (offsets are absolute indices into the flat value buffer, so sliced
    arrays read correctly; every shape has >= 1 ring of >= 3 points)."""
    col = batch.column("rings")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        z = np.zeros(0, np.int64)
        return z, z, z, z
    outer = np.asarray(col.offsets, dtype=np.int64)
    inner = col.values
    ioff = np.asarray(inner.offsets, dtype=np.int64)
    flat = np.asarray(inner.values, dtype=np.int64)
    end_pt = int(ioff[outer[-1]]) // 2   # clip a sliced buffer's tail
    xs = flat[0::2][:end_pt]
    ys = flat[1::2][:end_pt]
    # point-space start of each row's flat coordinate run
    starts = ioff[outer[:-1]] // 2
    x0 = np.minimum.reduceat(xs, starts)
    y0 = np.minimum.reduceat(ys, starts)
    x1 = np.maximum.reduceat(xs, starts)
    y1 = np.maximum.reduceat(ys, starts)
    return x0, y0, x1, y1


def _component_root(current, finals, max_group_rows: int):
    """Parallel root: group the pre-root rows by transitive
    bbox-overlap component (driver union-find over the bounded bbox
    table) and union each component in its own task — shapes that can
    never interact skip the single-task global union entirely, and the
    salted pre-round's extra shuffle barrier disappears."""
    bb = current.map_batches(
        lambda b: pa.table(dict(zip(("x0", "y0", "x1", "y1"),
                                    [pa.array(a, pa.int64()) for a in
                                     _batch_bboxes(b)]))),
        batch_format="pyarrow").to_pandas()
    boxes = list(zip(bb["x0"].tolist(), bb["y0"].tolist(),
                     bb["x1"].tolist(), bb["y1"].tolist()))
    uniq = sorted(set(boxes))
    comps = _boxes_components(uniq)
    comp_of = {}
    for ci, members in enumerate(comps):
        for m in members:
            comp_of[uniq[m]] = ci
    comp_ref = ray.put(comp_of)

    def comp_key(batch: pa.Table) -> pa.Table:
        lookup = ray.get(comp_ref)
        x0, y0, x1, y1 = _batch_bboxes(batch)
        k = [lookup[(int(a), int(b), int(c), int(d))]
             for a, b, c, d in zip(x0, y0, x1, y1)]
        return batch.append_column("gkey", pa.array(k, pa.int64()))

    def comp_union(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.table({"level": pa.array([], pa.int64()),
                             "cell": pa.array([], pa.int64()),
                             "rings": pa.array([], RINGS)})
        shapes = [rings_to_shape(r)
                  for r in group.column("rings").to_pylist()]
        merged = _union_chunked(shapes, max_group_rows) \
            if len(shapes) > 1 else shapes
        return pa.table({
            "level": pa.array([-1] * len(merged), pa.int64()),
            "cell": pa.array([0] * len(merged), pa.int64()),
            "rings": pa.array([shape_to_rings(s) for s in merged],
                              RINGS),
        })

    out = (current.map_batches(comp_key, batch_format="pyarrow")
           .groupby("gkey")
           .map_groups(comp_union, batch_format="pyarrow"))
    for f in finals:
        out = out.union(f)
    return out


def _union_group(group: pa.Table, next_level: int, next_cell: int,
                 max_group_rows: int) -> pa.Table:
    shapes = [rings_to_shape(r) for r in group.column("rings").to_pylist()]
    merged = _union_chunked(shapes, max_group_rows)
    return pa.table({
        "level": pa.array([next_level] * len(merged), pa.int64()),
        "cell": pa.array([next_cell] * len(merged), pa.int64()),
        "rings": pa.array([shape_to_rings(s) for s in merged], RINGS),
    })


def _ancestor_cell(level: np.ndarray, cell: np.ndarray, L: int
                   ) -> np.ndarray:
    """Ancestor cell id at level L of (level <= L, cell) rows."""
    sh = (L - level).astype(np.int64)
    cx = (cell >> 20) >> sh
    cy = (cell & 0xFFFFF) >> sh
    return (cx << 20) | cy


def _local_quad_reduce(group: pa.Table, L: int, base: int, levels: int,
                       max_group_rows: int, may_finalize: bool
                       ) -> pa.Table:
    """Combiner round: union levels 0..L of ONE level-L ancestor cell
    entirely inside a single task (no per-level shuffles), emitting the
    result exactly where the per-level rounds would have (level L+1 at
    the parent cell, or a salt cell when L+1 is the coarsest level).
    Groups whose rows sit above level L pass through unchanged."""
    lv = group.column("level").to_pylist()
    if lv[0] > L:
        return group.select(["level", "cell", "rings"])
    cl = group.column("cell").to_pylist()
    buckets: dict = {}
    for l, c, r in zip(lv, cl, group.column("rings").to_pylist()):
        buckets.setdefault((l, c), []).append(rings_to_shape(r))
    for lev in range(L):
        for key in [k for k in buckets if k[0] == lev]:
            shapes = _union_chunked(buckets.pop(key), max_group_rows)
            p = int(parent_cell(np.array([key[1]], np.int64))[0])
            buckets.setdefault((lev + 1, p), []).extend(shapes)
    top = [k for k in buckets if k[0] == L]
    gcell = top[0][1]
    shapes = []
    for k in top:
        shapes.extend(buckets.pop(k))
    merged = _union_chunked(shapes, max_group_rows)
    nxt = L + 1
    if nxt == levels - 1:
        ncell = gcell % 8            # salt the root entry
    else:
        ncell = int(parent_cell(np.array([gcell], np.int64))[0])
    lvl = np.full(len(merged), nxt, dtype=np.int64)
    if may_finalize and merged:
        size = base << L
        lo_x = (gcell >> 20) * size
        lo_y = (gcell & 0xFFFFF) * size
        for i, shape in enumerate(merged):
            xs = [p[0] for p in shape[0]]
            ys = [p[1] for p in shape[0]]
            if min(xs) > lo_x and max(xs) < lo_x + size and \
                    min(ys) > lo_y and max(ys) < lo_y + size:
                lvl[i] = -1
    return pa.table({
        "level": pa.array(lvl, pa.int64()),
        "cell": pa.array([ncell] * len(merged), pa.int64()),
        "rings": pa.array([shape_to_rings(s) for s in merged], RINGS),
    })


def dissolve(ds: "ray.data.Dataset", base: int = 64, levels: int = 5,
             max_group_rows: int = 512, local_levels: int = 2
             ) -> "ray.data.Dataset":
    """Union all polygons in ``ds`` (columns: rings, x0, y0, x1, y1)
    into a multipolygon dataset (one row per output shape).

    Coordinates must be non-negative and < base << (levels - 1) * 2^20
    ... practically: the world must fit the coarsest grid.

    ``local_levels``: how many of the finest levels are absorbed by the
    COMBINER round — one groupby at the level-``local_levels`` ancestor
    cell whose task runs the whole sub-quad-tree locally. Each dataset
    round is a full shuffle barrier (~0.5 s fixed cost locally, a real
    exchange on a cluster), so folding the geometrically-shrinking
    bottom rounds into one is the classic partial-aggregate move; the
    group size stays bounded because a level-L cell only holds what fit
    below it, and the in-task chunked combiner caps peak segment count.
    """

    def assign(batch: pa.Table) -> pa.Table:
        level, cell = smallest_cell(
            batch.column("x0").to_numpy(), batch.column("y0").to_numpy(),
            batch.column("x1").to_numpy(), batch.column("y1").to_numpy(),
            base, levels)
        return pa.table({
            "level": pa.array(level, pa.int64()),
            "cell": pa.array(cell, pa.int64()),
            "rings": batch.column("rings"),
        })

    current = ds.map_batches(assign, batch_format="pyarrow")

    # one cheap histogram pass for DEEP hierarchies: shuffle rounds
    # only run for levels that actually hold geometry (shallow data
    # under many levels would otherwise pay a pass-through shuffle per
    # empty level); per-batch unique + driver merge — a block scan,
    # not a groupby exchange. For shallow hierarchies the histogram
    # cannot prune anything the loop wouldn't run anyway, so skip the
    # pass (and the extra materialization of `current` it needs) and
    # assume every level is populated.
    import pyarrow.compute as pc

    if levels >= 4:
        current = current.materialize()

        def _levels_of(batch: pa.Table) -> pa.Table:
            return pa.table({"level": pc.unique(batch.column("level"))})

        present = set(
            r["level"] for r in
            current.map_batches(_levels_of,
                                batch_format="pyarrow").take_all())
    else:
        present = set(range(levels))
    max_input = max(present) if present else 0
    finals = []

    start_lev = 0
    if levels < 2:
        # the level loop below issues count() actions on `current`;
        # without the combiner's materialize it would re-execute
        current = current.materialize()
    if levels >= 2:
        L = min(local_levels, levels - 2)
        may_fin0 = L >= max_input

        def local_key(batch: pa.Table) -> pa.Table:
            lv = batch.column("level").to_numpy(zero_copy_only=False)
            cl = batch.column("cell").to_numpy(zero_copy_only=False) \
                .copy()
            low = lv <= L
            if low.any():
                cl[low] = _ancestor_cell(lv[low], cl[low], L)
            gl = np.where(low, L, lv)
            k = (gl.astype(np.int64) << 42) | cl
            return batch.append_column("gkey", pa.array(k, pa.int64()))

        def local_reduce(group: pa.Table) -> pa.Table:
            if len(group) == 0:
                return pa.table({"level": pa.array([], pa.int64()),
                                 "cell": pa.array([], pa.int64()),
                                 "rings": pa.array([], RINGS)})
            return _local_quad_reduce(
                group.select(["level", "cell", "rings"]), L, base,
                levels, max_group_rows, may_fin0)

        current = (current.map_batches(local_key, batch_format="pyarrow")
                   .groupby("gkey")
                   .map_groups(local_reduce, batch_format="pyarrow")
                   ).materialize()
        if may_fin0:
            finals.append(current.filter(expr="level == -1"))
            current = current.filter(expr="level >= 0")
        present = {l for l in present if l > L}
        present.add(L + 1)
        start_lev = L + 1

    for lev in range(start_lev, levels):
        last = lev == levels - 1
        if lev not in present and not last:
            continue
        if last:
            cnt = current.count()
            if cnt <= max_group_rows:
                # leftover is one group's worth: the root union handles
                # it directly, no salted pre-round needed
                break
            if cnt <= DRIVER_COMPONENTS_CAP:
                # parallel component root: skips BOTH the salted
                # pre-union barrier and the single-task global union
                return _component_root(current, finals, max_group_rows)
        # merged output of level lev lands on lev+1 (or the root)
        present.add(levels - 1 if lev + 1 == levels - 1 else lev + 1)
        # once every ORIGINAL input level has been absorbed, a merged
        # shape strictly inside its cell can never meet more geometry:
        # emit it as FINAL (level = -1) and skip all further shuffles
        may_finalize = lev >= max_input and not last

        def union_level(group: pa.Table, lev=lev, last=last,
                        may_finalize=may_finalize) -> pa.Table:
            if len(group) == 0:
                return pa.table({"level": pa.array([], pa.int64()),
                                 "cell": pa.array([], pa.int64()),
                                 "rings": pa.array([], RINGS)})
            glev = group.column("level")[0].as_py()
            gcell = group.column("cell")[0].as_py()
            if glev != lev:
                # pass through rows waiting for their level
                return group.select(["level", "cell", "rings"])
            nxt = lev if last else lev + 1
            if last:
                ncell = gcell
            elif nxt == levels - 1:
                # SALT the root: risers pre-union in 8 parallel groups
                # at the top level; a final round merges the salts
                # (union is associative, so grouping is free to choose)
                ncell = gcell % 8
            else:
                ncell = int(parent_cell(np.array([gcell], np.int64))[0])
            out = _union_group(group, nxt, ncell, max_group_rows)
            if not may_finalize or len(out) == 0:
                return out
            size = base << lev
            lo_x = (gcell >> 20) * size
            lo_y = (gcell & 0xFFFFF) * size
            lvl = out.column("level").to_numpy(zero_copy_only=False).copy()
            for i, rings in enumerate(out.column("rings").to_pylist()):
                xs = rings[0][0::2]
                ys = rings[0][1::2]
                if min(xs) > lo_x and max(xs) < lo_x + size and \
                        min(ys) > lo_y and max(ys) < lo_y + size:
                    lvl[i] = -1
            return out.set_column(0, "level", pa.array(lvl, pa.int64()))

        # single combined key so one shuffle handles (level, cell)
        def keyed(batch: pa.Table) -> pa.Table:
            k = (batch.column("level").to_numpy(zero_copy_only=False) << 42) \
                | batch.column("cell").to_numpy(zero_copy_only=False)
            return batch.append_column("gkey", pa.array(k, pa.int64()))

        current = (current.map_batches(keyed, batch_format="pyarrow")
                   .groupby("gkey")
                   .map_groups(union_level, batch_format="pyarrow"))
        current = current.materialize()
        if may_finalize:
            # lazy filters over the materialized level output: cheap
            # block scans at consumption, no extra barriers per level
            finals.append(current.filter(expr="level == -1"))
            current = current.filter(expr="level >= 0")

    # merge the salted top-level groups into the single global root
    def root_union(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.table({"level": pa.array([], pa.int64()),
                             "cell": pa.array([], pa.int64()),
                             "rings": pa.array([], RINGS)})
        return _union_group(group, levels - 1, 0, max_group_rows)

    def root_key(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "gkey", pa.array(np.zeros(len(batch), np.int64)))

    current = (current.map_batches(root_key, batch_format="pyarrow")
               .groupby("gkey")
               .map_groups(root_union, batch_format="pyarrow"))
    for f in finals:
        current = current.union(f)
    return current


def dissolve_area2(ds: "ray.data.Dataset", **kw) -> int:
    """Total 2x-area of the dissolved union (holes subtract)."""
    out = dissolve(ds, **kw)

    def area(batch: pa.Table) -> pa.Table:
        # vectorized shoelace straight off the Arrow buffers: one naive
        # consecutive-pair sum over the flat (x, y) stream, then fix the
        # terms that crossed ring borders and add each ring's wrap term
        col = batch.column("rings")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        inner = col.values            # list<int64> rings
        off1 = np.asarray(inner.offsets, dtype=np.int64)
        flat = np.asarray(inner.values, dtype=np.int64)
        a0 = off1[0]
        flat = flat[a0:off1[-1]]
        bounds = (off1 - a0) // 2      # ring boundaries in point space
        xs = flat[0::2]
        ys = flat[1::2]
        total = 0
        if len(xs) > 1:
            total = int(np.sum(xs[:-1] * ys[1:] - xs[1:] * ys[:-1]))
        ends = bounds[1:]
        starts = bounds[:-1]
        ok = ends > starts
        e = ends[ok] - 1               # last point of each ring
        s = starts[ok]
        # remove border terms e -> e+1 (except after the final ring)
        inner_e = e[e + 1 < len(xs)]
        if len(inner_e):
            total -= int(np.sum(xs[inner_e] * ys[inner_e + 1]
                                - xs[inner_e + 1] * ys[inner_e]))
        # add each ring's wrap term e -> s
        total += int(np.sum(xs[e] * ys[s] - xs[s] * ys[e]))
        return pa.table({"area2": pa.array([total], pa.int64())})

    parts = out.map_batches(area, batch_format="pyarrow").to_pandas()
    return int(parts["area2"].sum())
