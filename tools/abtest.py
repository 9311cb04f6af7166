"""Noise-immune kernel micro-benchmarks for A/B comparisons.

The host's wall-clock AND cpu-seconds swing ~2x with co-tenant load
(see BASELINE.md), so single readings are meaningless. Usage:

    python tools/abtest.py LABEL          # one reading
    # interleaved A/B against the previous commit:
    for i in 1 2 3; do
        git stash -q; python tools/abtest.py OLD$i
        git stash pop -q; python tools/abtest.py NEW$i
    done

Compare medians of the interleaved readings; accept only consistent
direction across rounds. Each workload reports process_time best-of-N
(faults and allocator churn are charged to CPU time on this host, so
best-of captures the quiet-iteration cost).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np          # noqa: E402
import pyarrow as pa        # noqa: E402


def best_of(fn, n=12):
    fn()
    best = 1e9
    for _ in range(n):
        t0 = time.process_time()
        fn()
        best = min(best, time.process_time() - t0)
    return best


def main(label: str) -> None:
    from ioverlay_ray.pipelines.perf_workloads import (LinesNetStage,
                                                       spiral_single)
    from ioverlay_ray.pipelines.checkerboard import XorSquareStage

    stage = LinesNetStage(1024, 16)
    batch = pa.table({"b": pa.array(np.array([3], np.int64))})
    print("%s linesnet-strip %.4f" % (label, best_of(lambda: stage(batch))))

    cb = XorSquareStage(1024)
    rng = np.random.default_rng(0)
    b2 = pa.table({
        "family": pa.array(np.zeros(512, np.int64)),
        "i": pa.array(rng.integers(0, 1024, 512).astype(np.int64)),
        "j": pa.array(rng.integers(0, 1024, 512).astype(np.int64)),
    })
    print("%s checker-pack %.4f" % (label, best_of(lambda: cb(b2))))

    print("%s spiral-32768 %.2f" % (
        label, best_of(lambda: spiral_single(32768), n=4)))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "run")
