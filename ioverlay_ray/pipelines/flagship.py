"""Flagship pipeline: H3-partitioned boolean-overlay spatial join over
the image+caption table.

read_parquet (pruned columns) -> AnnotateStage (derive footprint +
star polygons, assign tile) -> OverlayStage (per-pair boolean op) ->
per-tile aggregate. Streaming end to end; the binary image payload is
never read (columns=['image_id','w','h']).
"""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ..stages.overlay_stage import AnnotateStage, MultiRuleOverlayStage, OverlayStage


def images_dataset(n_images: int = 512, seed: int = 42,
                   path: str | None = None) -> "ray.data.Dataset":
    """Materialize (once) and read the synthetic images table."""
    if path is None:
        path = os.path.join(tempfile.gettempdir(),
                            f"ioverlay_images_{n_images}_{seed}")
    marker = os.path.join(path, "_DONE")
    if not os.path.exists(marker):
        os.makedirs(path, exist_ok=True)
        # parallel sharded generation: one Ray task per shard
        import ray

        @ray.remote
        def gen_shard(s0: int, count: int, fn: str):
            import os as _os
            from ioverlay_ray.sources.synth import make_images_table_range
            t = make_images_table_range(s0, s0 + count, seed)
            tmp = fn + f".tmp{_os.getpid()}"
            pq.write_table(t, tmp)
            _os.replace(tmp, fn)  # atomic: concurrent generators converge

        shard = 1024
        refs = []
        for s0 in range(0, n_images, shard):
            fn = os.path.join(path, f"part_{s0:09d}.parquet")
            if not os.path.exists(fn):
                refs.append(gen_shard.remote(
                    s0, min(shard, n_images - s0), fn))
        ray.get(refs)
        open(marker, "w").close()
    import ray

    from ..sources.images import read_images
    cpus = int(ray.cluster_resources().get("CPU", 8))
    n_files = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    return read_images(path, columns=["image_id", "w", "h"],
                       override_num_blocks=max(n_files, cpus * 2))


def overlay_join(ds: "ray.data.Dataset", rule: str = "intersect",
                 fill_rule: str = "nonzero", resolution: int = 4,
                 concurrency: int | None = None,
                 batch_size: int | None = None) -> "ray.data.Dataset":
    """images -> annotations -> per-pair overlay results.

    batch_size=None lets the input block size set task granularity —
    images_dataset targets ~2x CPUs blocks so every core stays busy
    without coalescing blocks into fewer tasks.
    """
    annotated = ds.map_batches(AnnotateStage(resolution),
                               batch_format="pyarrow",
                               batch_size=batch_size)
    return annotated.map_batches(
        OverlayStage(rule, fill_rule), batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency)


def overlay_join_stats(ds: "ray.data.Dataset", rule: str = "intersect",
                       fill_rule: str = "nonzero", resolution: int = 4,
                       concurrency: int | None = None,
                       batch_size: int | None = None) -> "ray.data.Dataset":
    """overlay_join for aggregation-only consumers: flat columnar
    end-to-end (no Python geometry), emitting (pair_id, tile_id, rule,
    n_shapes, area2) rows only. Same values as overlay_join minus the
    shapes column."""
    from ..stages.overlay_stage import OverlayStatsStage
    annotated = ds.map_batches(AnnotateStage(resolution),
                               batch_format="pyarrow",
                               batch_size=batch_size)
    return annotated.map_batches(
        OverlayStatsStage(rule, fill_rule), batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency)


def overlay_join_all_rules_stats(ds, rules=("intersect", "union",
                                             "difference", "xor"),
                                 fill_rule="nonzero", resolution: int = 4,
                                 batch_size: int = 256,
                                 concurrency: int | None = None):
    """Multi-rule join emitting stats rows only (graph-view + flat
    columnar; no shapes column) — same row count/values as
    overlay_join_all_rules minus the geometry."""
    from ..stages.overlay_stage import MultiRuleStatsStage
    annotated = ds.map_batches(AnnotateStage(resolution),
                               batch_format="pyarrow",
                               batch_size=max(1024, batch_size))
    return annotated.map_batches(
        MultiRuleStatsStage(rules, fill_rule), batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency)


def overlay_join_all_rules(ds, rules=("intersect", "union", "difference",
                                      "xor"), fill_rule="nonzero",
                           resolution: int = 4, batch_size: int = 256,
                           concurrency: int | None = None):
    annotated = ds.map_batches(AnnotateStage(resolution),
                               batch_format="pyarrow",
                               batch_size=max(1024, batch_size))
    return annotated.map_batches(
        MultiRuleOverlayStage(rules, fill_rule), batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency)


def overlay_join_checkpointed(out_dir: str, n_images: int = 512,
                              rule: str = "intersect",
                              fill_rule: str = "nonzero",
                              resolution: int = 4,
                              shard_files: int = 1) -> dict:
    """Flagship join with per-partition checkpointing: each input parquet
    shard becomes a recovery unit (state/checkpoint.py). A re-run skips
    finished shards; the combined output reads back with read_output."""
    from ..state.checkpoint import Shard, run_checkpointed

    # materialize the synthetic table, collect its files as shards
    images_dataset(n_images)
    import tempfile
    path = os.path.join(tempfile.gettempdir(),
                        f"ioverlay_images_{n_images}_42")
    files = sorted(os.path.join(path, f) for f in os.listdir(path)
                   if f.endswith(".parquet"))
    shards = [
        Shard(shard_id=f"{i:05d}",
              lineage={"input": files[i:i + shard_files],
                       "pipeline": "overlay_join"})
        for i in range(0, len(files), shard_files)
    ]

    def run_shard(shard: Shard) -> "ray.data.Dataset":
        ds = ray.data.read_parquet(shard.lineage["input"],
                                   columns=["image_id", "w", "h"])
        return overlay_join(ds, rule, fill_rule, resolution)

    config = {"rule": rule, "fill_rule": fill_rule,
              "resolution": resolution, "n_images": n_images}
    return run_checkpointed(shards, run_shard, out_dir, config)


def tile_summary(results: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-tile rollup (tiny result; safe to collect)."""
    from ..stages.agg import hash_aggregate
    keep = results.map_batches(
        lambda b: b.select(["tile_id", "n_shapes", "area2"]),
        batch_format="pyarrow")
    return hash_aggregate(keep, ["tile_id"], {
        "pairs": ("n_shapes", "count"),
        "shapes": ("n_shapes", "sum"),
        "area2": ("area2", "sum"),
    }, num_partitions=8)
