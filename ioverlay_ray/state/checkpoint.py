"""Per-partition checkpointing with lineage + metrics.

Resumable-output layout (BASELINE.json north_rule: "resumable from
checkpoint with per-partition lineage + metrics"):

    out_dir/
      part-<shard_id>/ ...parquet files...   (one directory per shard)
      _MANIFEST.jsonl                        (one record per finished shard)

A shard is the unit of recovery: a named slice of the input (a source
file, a key range, a tile span). ``run_checkpointed`` skips every shard
already recorded in the manifest, so a killed job resumes where it
stopped — including "mid-shuffle" in the sense that each shard's
internal shuffle re-runs only for unfinished shards. Writes are atomic:
data lands in ``part-<id>.tmp`` and is renamed only after success; the
manifest line is appended after the rename, so a crash between the two
at worst re-does one shard (idempotent).

Manifest record: shard id, input lineage (what produced it), row count,
wall seconds, pipeline config fingerprint, ISO timestamp.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import dataclass, field
from typing import Callable, Iterable, Optional

MANIFEST = "_MANIFEST.jsonl"


@dataclass
class Shard:
    shard_id: str
    lineage: dict = field(default_factory=dict)  # e.g. {"input": [...]}


def _config_fingerprint(config: dict) -> str:
    return hashlib.sha256(
        json.dumps(config, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]


def load_manifest(out_dir: str) -> dict:
    """shard_id -> manifest record for every completed shard."""
    path = os.path.join(out_dir, MANIFEST)
    done = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    rec = json.loads(line)
                    done[rec["shard_id"]] = rec
    return done


def run_checkpointed(shards: Iterable[Shard],
                     run_shard: Callable[[Shard], "object"],
                     out_dir: str, config: Optional[dict] = None) -> dict:
    """Run ``run_shard`` for every shard not already in the manifest and
    write its Dataset result to ``out_dir/part-<id>`` atomically.

    ``run_shard(shard)`` returns a ray.data.Dataset (or None to record
    an empty shard). Returns a summary {ran, skipped, rows}.

    If ``config`` differs from the fingerprint recorded for a finished
    shard, that shard is re-run (the old output is replaced) — a changed
    pipeline invalidates its checkpoints.
    """
    os.makedirs(out_dir, exist_ok=True)
    config = config or {}
    fingerprint = _config_fingerprint(config)
    done = load_manifest(out_dir)
    manifest_path = os.path.join(out_dir, MANIFEST)

    ran, skipped, total_rows = [], [], 0
    for shard in shards:
        rec = done.get(shard.shard_id)
        if rec is not None and rec.get("config") == fingerprint:
            skipped.append(shard.shard_id)
            total_rows += rec.get("rows", 0)
            continue

        part_dir = os.path.join(out_dir, f"part-{shard.shard_id}")
        tmp_dir = part_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        t0 = time.time()
        ds = run_shard(shard)
        rows = 0
        if ds is not None:
            ds.write_parquet(tmp_dir)
            rows = sum(
                _parquet_rows(os.path.join(tmp_dir, f))
                for f in os.listdir(tmp_dir) if f.endswith(".parquet"))
        else:
            os.makedirs(tmp_dir, exist_ok=True)
        shutil.rmtree(part_dir, ignore_errors=True)
        os.rename(tmp_dir, part_dir)

        record = {
            "shard_id": shard.shard_id,
            "lineage": shard.lineage,
            "rows": rows,
            "wall_sec": round(time.time() - t0, 3),
            "config": fingerprint,
            "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        with open(manifest_path, "a") as f:
            f.write(json.dumps(record) + "\n")
        ran.append(shard.shard_id)
        total_rows += rows

    return {"ran": ran, "skipped": skipped, "rows": total_rows,
            "out_dir": out_dir}


def _parquet_rows(path: str) -> int:
    import pyarrow.parquet as pq
    return pq.ParquetFile(path).metadata.num_rows


def read_output(out_dir: str, config: Optional[dict] = None):
    """Re-open all finished partitions as one Dataset.

    Driven by the manifest, not a directory glob: only shards the
    manifest vouches for are read, so orphaned part-* directories left
    by dropped/renamed shards never leak into a resumed output. With
    ``config``, only shards recorded under that config fingerprint are
    included."""
    import ray.data
    done = load_manifest(out_dir)
    if config is not None:
        fingerprint = _config_fingerprint(config)
        done = {k: v for k, v in done.items()
                if v.get("config") == fingerprint}
    parts = [os.path.join(out_dir, f"part-{sid}") for sid in sorted(done)]
    files = [os.path.join(p, f) for p in parts
             if os.path.isdir(p)
             for f in sorted(os.listdir(p)) if f.endswith(".parquet")]
    return ray.data.read_parquet(files)
