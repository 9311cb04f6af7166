"""Cluster entrypoint for the flagship overlay join.

Submit on a real cluster:

    ray job submit --working-dir . -- \
        python tools/run_flagship.py --n-images 1000000 \
        --out /mnt/shared/overlay_out --rule intersect

The job is resumable: re-submitting with the same --out skips every
shard already recorded in the checkpoint manifest
(ioverlay_ray/state/checkpoint.py), so a preempted or failed run
continues where it stopped. Prints one JSON line of metrics.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=8192)
    ap.add_argument("--out", default="/tmp/ioverlay_flagship_out")
    ap.add_argument("--rule", default="intersect")
    ap.add_argument("--fill-rule", default="nonzero")
    ap.add_argument("--resolution", type=int, default=4)
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"))

    from ioverlay_ray.pipelines import flagship
    from ioverlay_ray.state.checkpoint import read_output

    t0 = time.time()
    summary = flagship.overlay_join_checkpointed(
        args.out, n_images=args.n_images, rule=args.rule,
        fill_rule=args.fill_rule, resolution=args.resolution)
    ds = read_output(args.out)
    tiles = flagship.tile_summary(ds).to_pandas()
    dt = time.time() - t0
    print(json.dumps({
        "out_dir": args.out,
        "rows": summary["rows"],
        "shards_ran": len(summary["ran"]),
        "shards_skipped": len(summary["skipped"]),
        "tiles": int(len(tiles)),
        "pairs": int(tiles["pairs"].sum()),
        "sec": round(dt, 3),
        "pairs_per_sec": int(tiles["pairs"].sum() / max(dt, 1e-9)),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
