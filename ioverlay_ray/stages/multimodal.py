"""Multimodal (image/audio/video) actor-pool stages.

Binary payload columns are opaque ``binary`` + typed metadata
(w, h, fmt / sample_rate / fps), per the input_hint schema. Each stage
is a callable CLASS for ``map_batches(Cls, concurrency=N)``: decoder
state (codec dispatch table, resize kernels) is built once per actor in
``__init__``; ``__call__`` processes one zero-copy Arrow batch.

The synthetic corpus uses fmt="raw" (zlib RGB) whose decode is real and
lossless (sources/synth.py:34-39 — the PSNR>=40dB round-trip invariant
is exact). Standard codecs (png/jpeg) dispatch to PIL when available;
this container has no image libs, so they raise NotImplementedError
with a clear message — the Ray-side plumbing (schema, batching, actor
lifecycle, output layout) is identical either way.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from ..sources.synth import phash64 as _phash64


def _decode_raw(data: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(zlib.decompress(data), np.uint8).reshape(h, w, 3)


def _decode_pil(data: bytes, w: int, h: int) -> np.ndarray:
    try:
        import io

        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "png/jpeg decode needs PIL, which is not in this container; "
            "synthetic data uses fmt='raw'") from e
    return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))


_CODECS = {"raw": _decode_raw, "png": _decode_pil, "jpg": _decode_pil,
           "jpeg": _decode_pil}


class DecodeStage:
    """bytes -> per-image stats (mean RGB, std, phash) without ever
    materializing all pixels at once; emits no binary columns so the
    downstream shuffle stays narrow."""

    def __init__(self, check_phash: bool = False):
        self.codecs = dict(_CODECS)  # per-actor dispatch (built once)
        self.check_phash = check_phash
        if check_phash:
            self._phash = _phash64

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_pylist()
        hs = batch.column("h").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        mean_r, mean_g, mean_b, std, ok = [], [], [], [], []
        for blob, w, h, fmt in zip(blobs, ws, hs, fmts):
            px = self.codecs[fmt](blob, w, h).astype(np.float64)
            mean_r.append(px[..., 0].mean())
            mean_g.append(px[..., 1].mean())
            mean_b.append(px[..., 2].mean())
            std.append(px.std())
            if self.check_phash:
                ok.append(int(self._phash(px.astype(np.uint8))))
        cols = {
            "image_id": batch.column("image_id"),
            "mean_r": pa.array(mean_r, pa.float64()),
            "mean_g": pa.array(mean_g, pa.float64()),
            "mean_b": pa.array(mean_b, pa.float64()),
            "std": pa.array(std, pa.float64()),
        }
        if self.check_phash:
            cols["phash_decoded"] = pa.array(ok, pa.int64())
        return pa.table(cols)


class ZonalStatsStage:
    """Geospatial zonal statistics over the image column: decode, then
    aggregate exact-integer channel sums inside a VECTOR zone — the
    diamond |x-cx| + |y-cy| <= r with (cx, cy) = (w//2, h//2),
    r = min(w, h)//3 — rasterized by per-row extents and reduced with
    a per-row prefix sum (one cumsum per image, no per-pixel Python).
    Emits (image_id, zone_px, sum_r, sum_g, sum_b); the binary column
    never leaves the stage, so everything downstream is narrow."""

    def __init__(self):
        self.codecs = dict(_CODECS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id")
        zone_px, sums = [], ([], [], [])
        for blob, w, h, fmt in zip(batch.column("bytes").to_pylist(),
                                   batch.column("w").to_pylist(),
                                   batch.column("h").to_pylist(),
                                   batch.column("fmt").to_pylist()):
            px = self.codecs[fmt](blob, w, h).astype(np.int64)
            cx, cy, r = w // 2, h // 2, min(w, h) // 3
            ys = np.arange(max(0, cy - r), min(h, cy + r + 1))
            half = r - np.abs(ys - cy)
            xlo = np.maximum(0, cx - half)
            xhi = np.minimum(w - 1, cx + half)
            zone_px.append(int((xhi - xlo + 1).sum()))
            # prefix sums along x with a leading zero column: the sum
            # over [xlo, xhi] is cc[y, xhi+1] - cc[y, xlo]
            cc = np.zeros((h, w + 1, 3), np.int64)
            np.cumsum(px, axis=1, out=cc[:, 1:])
            seg = cc[ys, xhi + 1] - cc[ys, xlo]
            tot = seg.sum(axis=0)
            for ch in range(3):
                sums[ch].append(int(tot[ch]))
        return pa.table({
            "image_id": ids,
            "zone_px": pa.array(zone_px, pa.int64()),
            "sum_r": pa.array(sums[0], pa.int64()),
            "sum_g": pa.array(sums[1], pa.int64()),
            "sum_b": pa.array(sums[2], pa.int64()),
        })


class ResizeStage:
    """Nearest-neighbour resize to a fixed (out_w, out_h); re-encodes
    with the raw codec. Pure numpy — no image libs needed."""

    def __init__(self, out_w: int = 32, out_h: int = 32):
        self.out_w = out_w
        self.out_h = out_h
        self.codecs = dict(_CODECS)

    def _resize(self, px: np.ndarray) -> np.ndarray:
        h, w, _ = px.shape
        yi = (np.arange(self.out_h) * h) // self.out_h
        xi = (np.arange(self.out_w) * w) // self.out_w
        return px[yi][:, xi]

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for blob, w, h, fmt in zip(batch.column("bytes").to_pylist(),
                                   batch.column("w").to_pylist(),
                                   batch.column("h").to_pylist(),
                                   batch.column("fmt").to_pylist()):
            px = self.codecs[fmt](blob, w, h)
            out.append(zlib.compress(self._resize(px).tobytes(), 1))
        return pa.table({
            "image_id": batch.column("image_id"),
            "bytes": pa.array(out, pa.binary()),
            "w": pa.array([self.out_w] * len(out), pa.int32()),
            "h": pa.array([self.out_h] * len(out), pa.int32()),
            "fmt": pa.array(["raw"] * len(out), pa.string()),
        })


class EmbedStage:
    """Image -> small feature vector (downsampled grayscale grid,
    normalized) usable by the ANN stages; a stand-in for batched model
    inference with the same actor/batch shape."""

    def __init__(self, grid: int = 8):
        self.grid = grid
        self.codecs = dict(_CODECS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = []
        g = self.grid
        for blob, w, h, fmt in zip(batch.column("bytes").to_pylist(),
                                   batch.column("w").to_pylist(),
                                   batch.column("h").to_pylist(),
                                   batch.column("fmt").to_pylist()):
            px = self.codecs[fmt](blob, w, h).astype(np.float64)
            gray = px.sum(axis=2)
            yi = (np.arange(g) * gray.shape[0]) // g
            xi = (np.arange(g) * gray.shape[1]) // g
            v = gray[yi][:, xi].flatten()
            n = np.linalg.norm(v)
            vecs.append((v / n if n else v).tolist())
        return pa.table({
            "image_id": batch.column("image_id"),
            "embedding": pa.array(vecs, pa.list_(pa.float64())),
        })


class FrameSampleStage:
    """'Video' = concatenated raw frames in one binary blob (n_frames x
    h x w x 3). Samples every k-th frame; emits one row per kept frame
    (1 -> many rows, the flat_map shape)."""

    def __init__(self, every_k: int = 2):
        self.every_k = every_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_no, blobs = [], [], []
        for vid, blob, w, h, n in zip(batch.column("video_id").to_pylist(),
                                      batch.column("bytes").to_pylist(),
                                      batch.column("w").to_pylist(),
                                      batch.column("h").to_pylist(),
                                      batch.column("n_frames").to_pylist()):
            frames = np.frombuffer(zlib.decompress(blob), np.uint8) \
                .reshape(n, h, w, 3)
            for k in range(0, n, self.every_k):
                ids.append(vid)
                frame_no.append(k)
                blobs.append(zlib.compress(frames[k].tobytes(), 1))
        return pa.table({
            "video_id": pa.array(ids, pa.string()),
            "frame": pa.array(frame_no, pa.int64()),
            "bytes": pa.array(blobs, pa.binary()),
        })


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Decoded-pixel PSNR (the >=40dB round-trip invariant)."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 ** 2 / mse)


class AudioFeatureStage:
    """'Audio' = zlib-compressed int16 PCM mono + sample_rate metadata.
    Emits per-clip features (duration, RMS, zero-crossing rate, peak) —
    the decode/feature shape for audio payload columns. Real PCM codecs
    (mp3/ogg) would dispatch to an audio lib; absent here, fmt='pcm'
    is the real path and others raise NotImplementedError."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, dur_ms, rms, zcr_e3, peak = [], [], [], [], []
        for aid, blob, sr, fmt in zip(batch.column("audio_id").to_pylist(),
                                      batch.column("bytes").to_pylist(),
                                      batch.column("sample_rate").to_pylist(),
                                      batch.column("fmt").to_pylist()):
            if fmt != "pcm":
                raise NotImplementedError(
                    f"codec {fmt!r} needs an audio lib; synthetic data "
                    "uses fmt='pcm'")
            pcm = np.frombuffer(zlib.decompress(blob), np.int16)
            ids.append(aid)
            dur_ms.append(int(len(pcm) * 1000 / sr))
            rms.append(float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2))))
            sign = np.sign(pcm[pcm != 0]) if (pcm != 0).any() else np.array([1])
            zcr = int((sign[1:] != sign[:-1]).sum()) if len(sign) > 1 else 0
            zcr_e3.append(int(zcr * 1000 / max(1, len(pcm))))
            peak.append(int(np.abs(pcm.astype(np.int64)).max()) if len(pcm)
                        else 0)
        return pa.table({
            "audio_id": pa.array(ids, pa.string()),
            "duration_ms": pa.array(dur_ms, pa.int64()),
            "rms": pa.array(rms, pa.float64()),
            "zcr_e3": pa.array(zcr_e3, pa.int64()),
            "peak": pa.array(peak, pa.int64()),
        })


from .util import stage_fn  # noqa: E402,F401  (shared task-pool form)


# ---------------------------------------------------------------------------
# Lossy round-trip PSNR gate
# ---------------------------------------------------------------------------

def encode_q6(pixels: np.ndarray) -> bytes:
    """Deterministic lossy codec "q6": each channel byte quantized to
    the midpoint of its 4-wide bucket (max per-channel error 2, uniform
    MSE 1.5 -> ~46.4 dB), then zlib-packed. Stands in for jpeg-class
    codecs (absent in this container) so the decoded-pixel PSNR>=40dB
    round-trip invariant is exercised on a genuinely lossy path."""
    q = ((pixels >> 2) << 2) | 2
    return zlib.compress(q.astype(np.uint8).tobytes(), 1)


def psnr_mdb(sse: int, npix: int) -> int:
    """PSNR in milli-dB from exact integer (sse, npix); one shared
    derivation so pipeline and oracle agree bit-for-bit on the float
    rounding. Lossless (sse == 0) caps at 99000."""
    import math
    if sse == 0:
        return 99000
    return int(round(1000.0 * 10.0 * math.log10(255.0 * 255.0 * npix / sse)))


class LossyPsnrStage:
    """Decode -> re-encode through the lossy q6 codec -> decode again ->
    exact integer SSE vs the original pixels: the north-rule round-trip
    invariant (decoded-pixel PSNR>=40dB for lossy codecs) as a
    distributed per-batch gate; caption byte-equality is gated
    separately by q_image_caption_roundtrip. Emits no binary columns
    downstream."""

    def __init__(self):
        self.codecs = dict(_CODECS)
        self.codecs["q6"] = _decode_raw  # q6 payload decodes like raw

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_pylist()
        hs = batch.column("h").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        npixs, sses, mdbs, oks = [], [], [], []
        for blob, w, h, fmt in zip(blobs, ws, hs, fmts):
            px = self.codecs[fmt](blob, w, h)
            lossy = self.codecs["q6"](encode_q6(px), w, h)
            diff = px.astype(np.int64) - lossy.astype(np.int64)
            sse = int((diff * diff).sum())
            npix = px.size
            mdb = psnr_mdb(sse, npix)
            npixs.append(npix)
            sses.append(sse)
            mdbs.append(mdb)
            oks.append(mdb >= 40000)
        return pa.table({
            "image_id": batch.column("image_id"),
            "npix": pa.array(npixs, pa.int64()),
            "sse": pa.array(sses, pa.int64()),
            "psnr_mdb": pa.array(mdbs, pa.int64()),
            "psnr_ok": pa.array([int(v) for v in oks], pa.int64()),
        })
