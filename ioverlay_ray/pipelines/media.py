"""Media (image) pipelines over the synthetic binary image table.

Rows-only queries (binary decode is not SQL-expressible); deterministic
output so the driver's row-count/schema check is stable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import flagship
from ..stages.multimodal import DecodeStage, EmbedStage


def q_image_decode_stats(sf_dir: str, n_images: int = 256) -> pd.DataFrame:
    """Decode every image (actor pool), emit per-image channel stats +
    the phash recomputed from decoded pixels (round-trip invariant in
    the distributed path)."""
    import os
    import tempfile

    import ray.data
    flagship.images_dataset(n_images)  # ensure materialized
    path = os.path.join(tempfile.gettempdir(),
                        f"ioverlay_images_{n_images}_42")
    files = [os.path.join(path, f) for f in sorted(os.listdir(path))
             if f.endswith(".parquet")]
    import ray as _ray
    nb = max(len(files), int(_ray.cluster_resources().get("CPU", 8)))
    ds = ray.data.read_parquet(
        files, columns=["image_id", "bytes", "w", "h", "fmt"],
        override_num_blocks=nb)
    out = ds.map_batches(DecodeStage, batch_format="pyarrow",
                         fn_constructor_kwargs={"check_phash": True},
                         concurrency=2).to_pandas()
    out = out.sort_values("image_id").reset_index(drop=True)
    # stable int columns for hashing
    for c in ("mean_r", "mean_g", "mean_b", "std"):
        out[c] = (out[c] * 1000).round().astype(np.int64)
    return out


def q_image_embed_topk(sf_dir: str, n_images: int = 256,
                       k: int = 5) -> pd.DataFrame:
    """Image embeddings (actor pool) -> brute-force cosine top-k of the
    first 4 images against the corpus (the multimodal ANN path)."""
    import os
    import tempfile

    import pyarrow as pa
    import ray.data

    from ..stages.ann import CosineTopKStage, merge_topk
    flagship.images_dataset(n_images)
    path = os.path.join(tempfile.gettempdir(),
                        f"ioverlay_images_{n_images}_42")
    files = [os.path.join(path, f) for f in sorted(os.listdir(path))
             if f.endswith(".parquet")]
    import ray as _ray
    nb = max(len(files), int(_ray.cluster_resources().get("CPU", 8)))
    ds = ray.data.read_parquet(
        files, columns=["image_id", "bytes", "w", "h", "fmt"],
        override_num_blocks=nb)
    emb = ds.map_batches(EmbedStage, batch_format="pyarrow", concurrency=2)
    emb_df = emb.to_pandas().sort_values("image_id").reset_index(drop=True)
    queries = np.array(emb_df["embedding"].iloc[:4].tolist())
    qids = list(range(4))

    t = pa.table({
        "vec_id": np.arange(len(emb_df), dtype=np.int64),
        "embedding": pa.array(emb_df["embedding"].tolist(),
                              pa.list_(pa.float64())),
    })
    partials = ray.data.from_arrow(t).map_batches(
        CosineTopKStage, batch_format="pyarrow",
        fn_constructor_args=(queries, qids, k), concurrency=2).to_pandas()
    out = merge_topk(pa.Table.from_pandas(partials), k).to_pandas()
    return out.astype(np.int64)


def q_raster_scanlines(sf_dir: str, n_images: int = 256) -> pd.DataFrame:
    """Raster<->vector clipping: per-image scanline coverage of the star
    annotation via the string clip kernel (rows-only check)."""
    import ray.data  # noqa: F401

    from ..stages.overlay_stage import AnnotateStage
    from ..stages.raster import ScanlineRasterStage
    ds = flagship.images_dataset(n_images)
    annotated = ds.map_batches(AnnotateStage(4), batch_format="pyarrow")
    out = annotated.map_batches(ScanlineRasterStage, batch_format="pyarrow",
                                concurrency=4).to_pandas()
    return out.sort_values("pair_id").reset_index(drop=True)


def decode_stats_oracle_rows(n_images: int = 256) -> list:
    """Independent recompute of q_image_decode_stats straight from the
    deterministic generator (sources/synth.py make_pixels) — no encode,
    no Ray: verifies the whole encode->parquet->decode pipeline
    round-trip. Returns (image_id, mean_r, mean_g, mean_b, std,
    phash_decoded) int-scaled rows for a SQL VALUES literal."""
    from ..sources.synth import _rng, make_pixels, phash64
    rows = []
    for i in range(n_images):
        rng = _rng(42, i)
        w = int(rng.integers(16, 64))
        h = int(rng.integers(16, 64))
        px = make_pixels(42, i, w, h).astype(np.float64)
        rows.append((
            f"img_{i:012d}",
            int(round(px[..., 0].mean() * 1000)),
            int(round(px[..., 1].mean() * 1000)),
            int(round(px[..., 2].mean() * 1000)),
            int(round(px.std() * 1000)),
            int(phash64(px.astype(np.uint8))),
        ))
    return rows


def embed_topk_oracle_rows(n_images: int = 256, k: int = 5) -> list:
    """Independent recompute of q_image_embed_topk from the generator:
    grayscale-grid embeddings, cosine scores, merge_topk's exact
    (query_id, -score, vec_id) ranking. Returns (query_id, rank,
    vec_id) rows."""
    from ..sources.synth import _rng, make_pixels
    g = 8
    vecs = []
    for i in range(n_images):
        rng = _rng(42, i)
        w = int(rng.integers(16, 64))
        h = int(rng.integers(16, 64))
        gray = make_pixels(42, i, w, h).astype(np.float64).sum(axis=2)
        yi = (np.arange(g) * gray.shape[0]) // g
        xi = (np.arange(g) * gray.shape[1]) // g
        v = gray[yi][:, xi].flatten()
        n = np.linalg.norm(v)
        vecs.append(v / n if n else v)
    emb = np.array(vecs)
    q = emb[:4]
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    sims = (emb / norms) @ qn.T
    rows = []
    for qi in range(4):
        order = sorted(range(n_images),
                       key=lambda v_: (-sims[v_, qi], v_))[:k]
        for r, v_ in enumerate(order, 1):
            rows.append((qi, r, v_))
    return rows
