"""Cluster job entrypoint (the `ray job submit` form of the engine).

On a real cluster:

    ray job submit --working-dir . -- \
        python tools/ray_job.py --pipeline flagship --n-images 1048576 \
        --out /mnt/results/flagship

The driver connects to the cluster it was submitted into
(``ray.init(address="auto")``), runs the requested pipeline
streaming, and writes partitioned Parquet through the checkpoint
manifest so a resubmitted job skips finished shards. In this sandbox
(no dashboard agent / job server) run it directly:
``python tools/ray_job.py --pipeline flagship --n-images 8192``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pipeline", default="flagship",
                    choices=["flagship", "flagship_checkpointed",
                             "tiled_linesnet"])
    ap.add_argument("--n-images", type=int, default=8192)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--out", default="/tmp/ioverlay_job_out")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        # under `ray job submit` the address resolves to the hosting
        # cluster; standalone it starts a local one
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 ignore_reinit_error=True, logging_level="ERROR")

    t0 = time.time()
    if args.pipeline == "flagship":
        from ioverlay_ray.pipelines import flagship
        ds = flagship.images_dataset(args.n_images)
        res = flagship.overlay_join_stats(ds, "intersect")
        summary = flagship.tile_summary(res).to_pandas()
        out = {"pipeline": "flagship", "pairs": int(summary["pairs"].sum()),
               "tiles": int(len(summary))}
    elif args.pipeline == "flagship_checkpointed":
        from ioverlay_ray.pipelines.flagship import overlay_join_checkpointed
        manifest = overlay_join_checkpointed(args.out,
                                             n_images=args.n_images)
        out = {"pipeline": "flagship_checkpointed",
               "shards": len(manifest.get("shards", manifest)),
               "out": args.out}
    else:
        from ioverlay_ray.pipelines.perf_workloads import (many_lines_x,
                                                           many_lines_y)
        from ioverlay_ray.pipelines.tiled_overlay import (rings_area2,
                                                          tiled_rings_ds)
        n = args.n
        a2 = rings_area2(tiled_rings_ds(many_lines_x(20, n),
                                        many_lines_y(20, n),
                                        "intersect", "nonzero"))
        assert a2 == 200 * n * n - 100 * n
        out = {"pipeline": "tiled_linesnet", "label": 2 * n, "area2": a2}
    out["sec"] = round(time.time() - t0, 3)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
