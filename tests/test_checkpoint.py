"""Checkpoint/lineage semantics: skip-finished, atomic replace,
config-fingerprint invalidation, combined read-back."""

import json
import os
import shutil

import pyarrow as pa
import ray.data

from ioverlay_ray.state.checkpoint import (MANIFEST, Shard, load_manifest,
                                           read_output, run_checkpointed)


def _shards(n):
    return [Shard(shard_id=f"{i:03d}", lineage={"input": [f"in_{i}"]})
            for i in range(n)]


def _runner(calls):
    def run_shard(shard):
        calls.append(shard.shard_id)
        return ray.data.from_arrow(pa.table({
            "shard": [shard.shard_id] * 3, "v": [1, 2, 3]}))
    return run_shard


def test_run_skip_resume(tmp_path, ray_session):
    out = str(tmp_path / "out")
    calls = []
    s = run_checkpointed(_shards(3), _runner(calls), out, {"cfg": 1})
    assert s["ran"] == ["000", "001", "002"] and s["rows"] == 9
    assert len(load_manifest(out)) == 3

    # resume: nothing recomputed
    calls2 = []
    s2 = run_checkpointed(_shards(3), _runner(calls2), out, {"cfg": 1})
    assert calls2 == [] and s2["skipped"] == ["000", "001", "002"]
    assert s2["rows"] == 9

    # simulate a crash that lost one partition's manifest line:
    # rewrite manifest without shard 001 -> only 001 re-runs
    recs = [json.loads(x) for x in open(os.path.join(out, MANIFEST))]
    with open(os.path.join(out, MANIFEST), "w") as f:
        for r in recs:
            if r["shard_id"] != "001":
                f.write(json.dumps(r) + "\n")
    calls3 = []
    s3 = run_checkpointed(_shards(3), _runner(calls3), out, {"cfg": 1})
    assert calls3 == ["001"] and s3["skipped"] == ["000", "002"]

    # combined read-back sees all partitions exactly once
    ds = read_output(out)
    assert ds.count() == 9


def test_config_change_invalidates(tmp_path, ray_session):
    out = str(tmp_path / "out")
    calls = []
    run_checkpointed(_shards(2), _runner(calls), out, {"rule": "union"})
    calls2 = []
    run_checkpointed(_shards(2), _runner(calls2), out, {"rule": "xor"})
    assert calls2 == ["000", "001"]  # new config re-runs everything


def test_manifest_records_lineage_and_metrics(tmp_path, ray_session):
    out = str(tmp_path / "out")
    run_checkpointed(_shards(1), _runner([]), out, {"cfg": 1})
    rec = load_manifest(out)["000"]
    assert rec["lineage"] == {"input": ["in_0"]}
    assert rec["rows"] == 3
    assert "wall_sec" in rec and "ts" in rec and "config" in rec


def test_flagship_checkpointed(tmp_path, ray_session):
    from ioverlay_ray.pipelines import flagship
    out = str(tmp_path / "flag")
    s = flagship.overlay_join_checkpointed(out, n_images=64)
    assert s["rows"] == 64
    # resume is a no-op
    s2 = flagship.overlay_join_checkpointed(out, n_images=64)
    assert s2["ran"] == [] and s2["rows"] == 64
    ds = read_output(out)
    assert ds.count() == 64
    assert "tile_id" in ds.schema().names


def test_curation_checkpointed(tmp_path, ray_session):
    """The curation flagship's resumable writer: output matches
    q_curation_pipeline row-for-row; a lost manifest line re-runs ONLY
    that pack shard on resume."""
    import json
    import os

    from ioverlay_ray.pipelines.relational import (q_curation_pipeline,
                                                   curation_to_parquet)

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "curated")
    s = curation_to_parquet(sf, out, n_shards=4)
    want = q_curation_pipeline(sf, n_shards=4)
    assert s["rows"] == len(want)
    got = read_output(out).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert got[["doc_id", "shard", "seq_len", "pack_id", "pack_off"]] \
        .equals(want)

    # resume is a no-op
    s2 = curation_to_parquet(sf, out, n_shards=4)
    assert s2["ran"] == [] and s2["rows"] == len(want)

    # lose shard 00002's manifest line -> only it re-runs
    recs = [json.loads(x) for x in open(os.path.join(out, MANIFEST))]
    with open(os.path.join(out, MANIFEST), "w") as f:
        for r in recs:
            if r["shard_id"] != "00002":
                f.write(json.dumps(r) + "\n")
    s3 = curation_to_parquet(sf, out, n_shards=4)
    assert s3["ran"] == ["00002"] and s3["rows"] == len(want)
