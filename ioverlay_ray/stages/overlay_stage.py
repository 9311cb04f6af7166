"""Ray Data stages for the boolean-overlay spatial join.

Callable classes for ``map_batches(Cls, batch_format="pyarrow",
concurrency=N)`` — construction cost (option resolution, kernel
warm-up) paid once per actor, per-batch work in __call__ over zero-copy
Arrow batches. The per-row unit of work is one overlay job (a
subject x clip pair), which is the pair-local execution regime from
SURVEY.md §7: embarrassingly parallel, no shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geometry import kernel
from ..geometry.overlay import overlay_pack, overlay_pack_all
from ..sources.synth import annotations_for_batch
from . import geo_arrow, tile


class AnnotateStage:
    """images batch -> per-image (pair_id, subj, clip, tile_id) geometry.

    Reads only (image_id, w, h): the binary payload never enters the
    geometry pipeline (wide rows stay out of shuffles, SURVEY.md §7.3).
    """

    def __init__(self, resolution: int = 4):
        self.resolution = resolution

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        indices = [int(s.rsplit("_", 1)[1]) for s in ids]
        ws = batch.column("w").to_pylist()
        hs = batch.column("h").to_pylist()
        subs, clips = annotations_for_batch(indices, ws, hs)
        xmin = np.array([s[0][0][0] for s in subs], np.int64)
        ymin = np.array([s[0][0][1] for s in subs], np.int64)
        xmax = np.array([s[0][2][0] for s in subs], np.int64)
        ymax = np.array([s[0][2][1] for s in subs], np.int64)
        tiles = tile.cell_of_bbox(xmin, ymin, xmax, ymax, self.resolution)
        return pa.table({
            "image_id": batch.column("image_id"),
            "pair_id": pa.array(indices, pa.int64()),
            "tile_id": pa.array(tiles, pa.int64()),
            "subj": geo_arrow.shape_array(subs),
            "clip": geo_arrow.shape_array(clips),
        })


class OverlayStage:
    """(subj, clip) pairs -> boolean overlay result rows.

    One kernel invocation per row; emits the multipolygon plus row-count
    and area metrics for cheap downstream aggregation.
    """

    def __init__(self, rule="intersect", fill_rule="nonzero",
                 clockwise: bool = False):
        self.rule = kernel.RULE_NAMES[rule] if isinstance(rule, str) else rule
        self.fill_rule = (kernel.FILL_RULE_NAMES[fill_rule]
                          if isinstance(fill_rule, str) else fill_rule)
        self.clockwise = clockwise

    def __call__(self, batch: pa.Table) -> pa.Table:
        subs = batch.column("subj").to_pylist()
        clips = batch.column("clip").to_pylist()
        # the whole batch runs as ONE packed kernel invocation
        # (overlay_pack): vectorized stages amortize across rows
        jobs = [(geo_arrow.shape_to_py(s), geo_arrow.shape_to_py(c))
                for s, c in zip(subs, clips)]
        results = overlay_pack(jobs, self.rule, self.fill_rule,
                               clockwise=self.clockwise)
        n_shapes = [len(shapes) for shapes in results]
        areas2 = [geo_arrow.shapes_area2(shapes) for shapes in results]
        out = {
            "pair_id": batch.column("pair_id"),
            "tile_id": batch.column("tile_id"),
            "rule": pa.array([self.rule] * len(subs), pa.uint8()),
            "shapes": geo_arrow.shapes_array(results),
            "n_shapes": pa.array(n_shapes, pa.int64()),
            "area2": pa.array(areas2, pa.int64()),
        }
        if "image_id" in batch.column_names:
            out["image_id"] = batch.column("image_id")
        return pa.table(out)


class OverlayStatsStage:
    """(subj, clip) pairs -> (n_shapes, area2) per row with NO Python
    geometry anywhere: Arrow nested lists are read as flat
    offsets+coords views (geo_arrow.shape_column_flat) and run through
    the packed stats kernel (overlay_pack_stats_flat). The stage for
    aggregation-only consumers (tile summaries, counts)."""

    def __init__(self, rule="intersect", fill_rule="nonzero",
                 clockwise: bool = False):
        self.rule = kernel.RULE_NAMES[rule] if isinstance(rule, str) else rule
        self.fill_rule = (kernel.FILL_RULE_NAMES[fill_rule]
                          if isinstance(fill_rule, str) else fill_rule)
        self.clockwise = clockwise

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..geometry.overlay import overlay_pack_stats_flat
        sx, sy, soff, srow = geo_arrow.shape_column_flat(
            batch.column("subj"))
        cx, cy, coff, crow = geo_arrow.shape_column_flat(
            batch.column("clip"))
        nrows = len(batch)
        # merge both sides into one job-sorted flat contour table
        job = np.concatenate((srow, crow))
        flags = np.concatenate((np.ones(len(srow), dtype=bool),
                                np.zeros(len(crow), dtype=bool)))
        lens = np.concatenate((np.diff(soff), np.diff(coff)))
        starts = np.concatenate((soff[:-1], coff[:-1] + len(sx)))
        xs_all = np.concatenate((sx, cx))
        ys_all = np.concatenate((sy, cy))
        order = np.argsort(job, kind="stable")
        job = job[order]
        flags = flags[order]
        lens = lens[order]
        starts = starts[order]
        total = int(lens.sum())
        # gather permuted contour vertices
        offs = np.concatenate(([0], np.cumsum(lens)))
        idx = np.arange(total, dtype=np.int64) \
            - np.repeat(offs[:-1], lens) + np.repeat(starts, lens)
        xs = xs_all[idx]
        ys = ys_all[idx]
        n_shapes, area2 = overlay_pack_stats_flat(
            xs, ys, offs, job, flags, self.rule, self.fill_rule,
            n_jobs=nrows, clockwise=self.clockwise)
        out = {
            "pair_id": batch.column("pair_id"),
            "tile_id": batch.column("tile_id"),
            "rule": pa.array([self.rule] * nrows, pa.uint8()),
            "n_shapes": pa.array(n_shapes, pa.int64()),
            "area2": pa.array(area2, pa.int64()),
        }
        if "image_id" in batch.column_names:
            out["image_id"] = batch.column("image_id")
        return pa.table(out)


class MultiRuleStatsStage:
    """OverlayStatsStage for several rules: split/fill once per packed
    batch, one stats extract per rule (graph-view), no Python geometry
    and no shapes column — the bandwidth-light form of the multi-rule
    join for aggregation consumers."""

    def __init__(self, rules=("intersect", "union", "difference", "xor"),
                 fill_rule="nonzero", clockwise: bool = False):
        self.rules = [(r, kernel.RULE_NAMES[r]) for r in rules]
        self.fill_rule = kernel.FILL_RULE_NAMES[fill_rule] \
            if isinstance(fill_rule, str) else fill_rule
        self.clockwise = clockwise

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..geometry.overlay import overlay_pack_stats_all_flat
        sx, sy, soff, srow = geo_arrow.shape_column_flat(
            batch.column("subj"))
        cx, cy, coff, crow = geo_arrow.shape_column_flat(
            batch.column("clip"))
        nrows = len(batch)
        job = np.concatenate((srow, crow))
        flags = np.concatenate((np.ones(len(srow), dtype=bool),
                                np.zeros(len(crow), dtype=bool)))
        lens = np.concatenate((np.diff(soff), np.diff(coff)))
        starts = np.concatenate((soff[:-1], coff[:-1] + len(sx)))
        xs_all = np.concatenate((sx, cx))
        ys_all = np.concatenate((sy, cy))
        order = np.argsort(job, kind="stable")
        job = job[order]
        flags = flags[order]
        lens = lens[order]
        starts = starts[order]
        total = int(lens.sum())
        offs = np.concatenate(([0], np.cumsum(lens)))
        idx = np.arange(total, dtype=np.int64) \
            - np.repeat(offs[:-1], lens) + np.repeat(starts, lens)
        per_rule = overlay_pack_stats_all_flat(
            xs_all[idx], ys_all[idx], offs, job, flags,
            [code for _, code in self.rules], self.fill_rule,
            n_jobs=nrows, clockwise=self.clockwise)
        pair = batch.column("pair_id").to_numpy(zero_copy_only=False)
        tile = batch.column("tile_id").to_numpy(zero_copy_only=False)
        out_pair = []
        out_tile = []
        out_rule = []
        out_n = []
        out_a = []
        for _, code in self.rules:
            n_polys, area2 = per_rule[code]
            out_pair.append(pair)
            out_tile.append(tile)
            out_rule.append(np.full(nrows, code, np.uint8))
            out_n.append(n_polys)
            out_a.append(area2)
        return pa.table({
            "pair_id": pa.array(np.concatenate(out_pair), pa.int64()),
            "tile_id": pa.array(np.concatenate(out_tile), pa.int64()),
            "rule": pa.array(np.concatenate(out_rule), pa.uint8()),
            "n_shapes": pa.array(np.concatenate(out_n), pa.int64()),
            "area2": pa.array(np.concatenate(out_a), pa.int64()),
        })


class MultiRuleOverlayStage:
    """Build the overlay graph once per pair, extract several rules
    (Overlay::build_graph_view pattern, core/overlay.rs:303-313)."""

    def __init__(self, rules=("intersect", "union", "difference", "xor"),
                 fill_rule="nonzero", clockwise: bool = False):
        self.rules = [(r, kernel.RULE_NAMES[r]) for r in rules]
        self.fill_rule = kernel.FILL_RULE_NAMES[fill_rule] \
            if isinstance(fill_rule, str) else fill_rule
        self.clockwise = clockwise

    def __call__(self, batch: pa.Table) -> pa.Table:
        subs = batch.column("subj").to_pylist()
        clips = batch.column("clip").to_pylist()
        pair_ids = batch.column("pair_id").to_pylist()
        tile_ids = batch.column("tile_id").to_pylist()
        jobs = [(geo_arrow.shape_to_py(s), geo_arrow.shape_to_py(c))
                for s, c in zip(subs, clips)]
        packed = overlay_pack_all(jobs, [code for _, code in self.rules],
                                  self.fill_rule, clockwise=self.clockwise)
        out_pair, out_tile, out_rule, out_shapes, out_n, out_a = \
            [], [], [], [], [], []
        for pid, tid, per_job in zip(pair_ids, tile_ids, packed):
            for name, code in self.rules:
                shapes = per_job[code]
                out_pair.append(pid)
                out_tile.append(tid)
                out_rule.append(code)
                out_shapes.append(shapes)
                out_n.append(len(shapes))
                out_a.append(geo_arrow.shapes_area2(shapes))
        return pa.table({
            "pair_id": pa.array(out_pair, pa.int64()),
            "tile_id": pa.array(out_tile, pa.int64()),
            "rule": pa.array(out_rule, pa.uint8()),
            "shapes": geo_arrow.shapes_array(out_shapes),
            "n_shapes": pa.array(out_n, pa.int64()),
            "area2": pa.array(out_a, pa.int64()),
        })
