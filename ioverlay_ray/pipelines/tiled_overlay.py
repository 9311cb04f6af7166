"""Ray pipeline for the tile-distributed boolean overlay.

fragment (flat_map) -> groupby(strip).map_groups(per-strip split +
fill + chain extraction) -> border-chain stitch -> hole binding.
The shuffle carries edge fragments once; the stitch input is only the
border-cut chains (O(result boundary crossing the borders)), which is
the small tail of the data — the "groupby-aggregate-sort shuffle for
cross-tile edge stitching" from the north star.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..geometry.kernel import FILL_RULE_NAMES, RULE_NAMES
from ..geometry.tiled import (assemble_shapes, fragment_contours,
                              stitch_chains, strip_chains)

PTS = pa.list_(pa.int64())  # flat x,y pairs


def tiled_overlay_ray(subj: Sequence, clip: Sequence, rule, fill_rule,
                      strip_w: int = 256) -> List[list]:
    """Distributed strip overlay; returns shapes-with-holes."""
    if isinstance(rule, str):
        rule = RULE_NAMES[rule.lower()]
    if isinstance(fill_rule, str):
        fill_rule = FILL_RULE_NAMES[fill_rule.lower().replace("_", "")]

    frags = fragment_contours(subj, True, strip_w) + \
        fragment_contours(clip, False, strip_w)
    t = pa.table({
        "strip": pa.array([f[0] for f in frags], pa.int64()),
        "ax": pa.array([f[1] for f in frags], pa.int64()),
        "ay": pa.array([f[2] for f in frags], pa.int64()),
        "bx": pa.array([f[3] for f in frags], pa.int64()),
        "by": pa.array([f[4] for f in frags], pa.int64()),
        "subj": pa.array([f[5] for f in frags], pa.int64()),
        "clip": pa.array([f[6] for f in frags], pa.int64()),
    })

    def per_strip(group: pa.Table) -> pa.Table:
        s = group.column("strip")[0].as_py()
        fs = list(zip(group.column("strip").to_pylist(),
                      group.column("ax").to_pylist(),
                      group.column("ay").to_pylist(),
                      group.column("bx").to_pylist(),
                      group.column("by").to_pylist(),
                      group.column("subj").to_pylist(),
                      group.column("clip").to_pylist()))
        rings, chains = strip_chains(fs, rule, fill_rule, strip_w, s)
        kinds = [0] * len(rings) + [1] * len(chains)
        pts = [[v for p in r for v in p] for r in rings] + \
              [[v for p in c for v in p] for c in chains]
        return pa.table({
            "kind": pa.array(kinds, pa.int64()),
            "pts": pa.array(pts, PTS),
        })

    out = (ray.data.from_arrow(t)
           .groupby("strip")
           .map_groups(per_strip, batch_format="pyarrow")
           .to_pandas())
    rings, chains = [], []
    for kind, flat in zip(out["kind"], out["pts"]):
        seq = list(zip(flat[0::2], flat[1::2]))
        (rings if kind == 0 else chains).append(seq)
    rings.extend(stitch_chains(chains))
    return assemble_shapes(rings)
