"""Multimodal actor-pool stages over the synthetic binary image table."""

import zlib

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from ioverlay_ray.sources import synth
from ioverlay_ray.stages.multimodal import (DecodeStage, EmbedStage,
                                            FrameSampleStage, ResizeStage,
                                            psnr)


def _images_ds(n=16):
    return ray.data.from_arrow(synth.make_images_table(n))


def test_decode_roundtrip_psnr(ray_session):
    out = _images_ds(8).map_batches(
        DecodeStage, fn_constructor_kwargs={"check_phash": True},
        batch_format="pyarrow", concurrency=2).to_pandas()
    assert len(out) == 8
    t = synth.make_images_table(8)
    # phash recomputed from decoded pixels matches the stored column:
    # exact round trip (PSNR = inf >= 40dB)
    stored = dict(zip(t.column("image_id").to_pylist(),
                      t.column("phash").to_pylist()))
    for _, row in out.iterrows():
        assert row["phash_decoded"] == stored[row["image_id"]]
    assert (out["std"] > 0).all()


def test_psnr_helper():
    a = np.zeros((4, 4, 3), np.uint8)
    assert psnr(a, a) == float("inf")
    b = a.copy()
    b[0, 0, 0] = 10
    assert 30 < psnr(a, b) < 100


def test_resize_stage(ray_session):
    out = _images_ds(6).map_batches(
        ResizeStage, fn_constructor_kwargs={"out_w": 16, "out_h": 12},
        batch_format="pyarrow", concurrency=2).to_pandas()
    assert (out["w"] == 16).all() and (out["h"] == 12).all()
    px = np.frombuffer(zlib.decompress(out["bytes"].iloc[0]),
                       np.uint8).reshape(12, 16, 3)
    assert px.shape == (12, 16, 3)


def test_embed_stage_feeds_ann(ray_session):
    emb = _images_ds(10).map_batches(
        EmbedStage, batch_format="pyarrow", concurrency=2).to_pandas()
    vecs = np.array(emb["embedding"].tolist())
    assert vecs.shape == (10, 64)
    norms = np.linalg.norm(vecs, axis=1)
    assert np.allclose(norms, 1.0)
    # nearest neighbour of each embedding (vs itself) is itself
    sims = vecs @ vecs.T
    assert (sims.argmax(axis=1) == np.arange(10)).all()


def test_frame_sample(ray_session):
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, size=(6, 4, 5, 3), dtype=np.uint8)
    t = pa.table({
        "video_id": ["v0"], "w": [5], "h": [4], "n_frames": [6],
        "bytes": [zlib.compress(frames.tobytes(), 1)],
    })
    out = ray.data.from_arrow(t).map_batches(
        FrameSampleStage, fn_constructor_kwargs={"every_k": 2},
        batch_format="pyarrow", concurrency=1).to_pandas()
    assert list(out["frame"]) == [0, 2, 4]
    f2 = np.frombuffer(zlib.decompress(out["bytes"].iloc[1]),
                       np.uint8).reshape(4, 5, 3)
    assert np.array_equal(f2, frames[2])


def test_png_decode_is_gated():
    stage = DecodeStage()
    batch = pa.table({
        "image_id": ["x"], "bytes": [b"\x89PNG"], "w": [1], "h": [1],
        "fmt": ["png"],
    })
    with pytest.raises(NotImplementedError):
        stage(batch)


def test_audio_features(ray_session):
    from ioverlay_ray.stages.multimodal import AudioFeatureStage
    rng = np.random.default_rng(7)
    sr = 16000
    tone = (np.sin(np.arange(sr) * 2 * np.pi * 440 / sr) * 10000) \
        .astype(np.int16)
    noise = rng.integers(-500, 500, sr // 2).astype(np.int16)
    t = pa.table({
        "audio_id": ["tone", "noise"],
        "sample_rate": [sr, sr],
        "fmt": ["pcm", "pcm"],
        "bytes": [zlib.compress(tone.tobytes(), 1),
                  zlib.compress(noise.tobytes(), 1)],
    })
    out = ray.data.from_arrow(t).map_batches(
        AudioFeatureStage, batch_format="pyarrow", concurrency=1).to_pandas()
    tone_row = out[out.audio_id == "tone"].iloc[0]
    noise_row = out[out.audio_id == "noise"].iloc[0]
    assert tone_row["duration_ms"] == 1000
    assert noise_row["duration_ms"] == 500
    assert tone_row["rms"] > noise_row["rms"]
    assert noise_row["zcr_e3"] > tone_row["zcr_e3"]  # noise crosses more


def test_pcm_only_gate():
    from ioverlay_ray.stages.multimodal import AudioFeatureStage
    t = pa.table({"audio_id": ["x"], "sample_rate": [8000],
                  "fmt": ["mp3"], "bytes": [b""]})
    with pytest.raises(NotImplementedError):
        AudioFeatureStage()(t)


def test_phash_neardup_pipeline(ray_session):
    """Distributed phash dedup == brute-force band-candidates + Hamming
    on the same generator; perturbed copies (i % 3 == 2) must be found."""
    import numpy as np

    from ioverlay_ray.pipelines.media import (_popcount64,
                                              q_image_phash_neardup)
    from ioverlay_ray.sources.synth import neardup_pixels, phash64

    n, thresh = 96, 6
    out = q_image_phash_neardup("", n_images=n, thresh=thresh)

    ph = np.array([phash64(neardup_pixels(i)[2]) for i in range(n)],
                  dtype=np.int64)
    exp = []
    for a in range(n):
        for b in range(a + 1, n):
            u, v = np.uint64(ph[a]), np.uint64(ph[b])
            shares = any(((u >> np.uint64(16 * k)) & np.uint64(0xFFFF))
                         == ((v >> np.uint64(16 * k)) & np.uint64(0xFFFF))
                         for k in range(4))
            ham = int(_popcount64(np.array([ph[a] ^ ph[b]]))[0])
            if shares and ham <= thresh:
                exp.append((a, b, ham))
    got = list(out.itertuples(index=False, name=None))
    assert got == exp
    # the constructed perturbed copies are really in there
    found = {(a, b) for a, b, _ in got}
    hits = sum((i - 1, i) in found for i in range(2, n, 3))
    assert hits >= (n // 3) * 3 // 4, hits


def test_lossy_psnr_gate():
    """q6 lossy round-trip: every image >=40dB; the stage's SSE equals
    a direct recompute; and the gate is non-vacuous (a coarser 16-wide
    quantizer would FAIL the 40dB bar on the same pixels)."""
    import numpy as np
    import pyarrow as pa

    from ioverlay_ray.sources.synth import encode_raw, make_pixels
    from ioverlay_ray.stages.multimodal import (LossyPsnrStage, encode_q6,
                                                psnr_mdb)

    ids, blobs, ws, hs = [], [], [], []
    pxs = []
    for i in range(16):
        w, h = 16 + 3 * i, 61 - 2 * i
        px = make_pixels(42, i, w, h)
        pxs.append(px)
        ids.append(f"img_{i:012d}")
        blobs.append(encode_raw(px))
        ws.append(w)
        hs.append(h)
    batch = pa.table({"image_id": ids, "bytes": blobs, "w": ws, "h": hs,
                      "fmt": ["raw"] * 16})
    out = LossyPsnrStage()(batch).to_pylist()
    for row, px in zip(out, pxs):
        assert row["psnr_ok"] == 1 and row["psnr_mdb"] >= 40000
        q = ((px.astype(np.int64) >> 2) << 2) | 2
        assert row["sse"] == int(((px.astype(np.int64) - q) ** 2).sum())
        # non-vacuous: a 16-wide quantizer misses the bar
        q16 = ((px.astype(np.int64) >> 4) << 4) | 8
        sse16 = int(((px.astype(np.int64) - q16) ** 2).sum())
        assert psnr_mdb(sse16, px.size) < 40000
    # encode_q6 output decodes to exactly the quantized pixels
    import zlib
    px = pxs[0]
    dec = np.frombuffer(zlib.decompress(encode_q6(px)),
                        np.uint8).reshape(px.shape)
    assert (dec == (((px >> 2) << 2) | 2)).all()
    # lossless path caps cleanly
    assert psnr_mdb(0, 100) == 99000


def test_phash_pairs_partitioning_complete(ray_session):
    """The band-hash part exchange must find exactly the pairs the
    direct all-bucket enumeration finds (every bucket lands whole in
    one part, and pair-distinct dedup is global because equal pairs
    hash to the same part)."""
    import numpy as np

    from ioverlay_ray.pipelines.media import q_image_phash_neardup
    from ioverlay_ray.sources.synth import neardup_pixels, phash64

    got = q_image_phash_neardup(None, n_images=96)

    phs = np.array([phash64(neardup_pixels(i)[2]) for i in range(96)],
                   dtype=np.uint64)
    want = set()
    for band in range(4):
        bv = (phs >> np.uint64(16 * band)) & np.uint64(0xFFFF)
        for v in np.unique(bv):
            members = np.flatnonzero(bv == v)
            for ai in range(len(members)):
                for bi in range(ai + 1, len(members)):
                    a, b = int(members[ai]), int(members[bi])
                    ham = bin(int(phs[a] ^ phs[b])).count("1")
                    if ham <= 6:
                        want.add((a, b, ham))
    got_set = set(zip(got["id_a"], got["id_b"], got["hamming"]))
    assert got_set == want
