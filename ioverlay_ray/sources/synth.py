"""Deterministic synthetic image+caption table and derived polygon
annotations (BASELINE.json input_hint; FIXTURES.md C.1/C.2).

Schema: (image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64). Pixels are seeded per image id; "raw"
format is zlib-compressed RGB (lossless round-trip, so the
decoded-pixel PSNR>=40dB invariant holds exactly). Star/rect annotation
polygons mirror the reference's randomized geometry generators
(tests/dynamic_tests.rs:24-53) quantized to the int grid.
"""

from __future__ import annotations

import math
import zlib

import numpy as np
import pyarrow as pa

WORDS = ("tile polygon overlay raster vector winding sweep segment cell "
         "grid union clip subject boolean contour hole anchor star image "
         "caption pixel footprint lattice shard stitch border").split()


def _rng(seed: int, i: int) -> np.random.Generator:
    return np.random.default_rng(np.random.SeedSequence([seed, i]))


def make_pixels(seed: int, i: int, w: int, h: int) -> np.ndarray:
    rng = _rng(seed, i)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def encode_raw(pixels: np.ndarray) -> bytes:
    return zlib.compress(pixels.tobytes(), level=1)


def decode_raw(data: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(zlib.decompress(data), dtype=np.uint8).reshape(h, w, 3)


def phash64(pixels: np.ndarray) -> int:
    """8x8 mean-threshold perceptual hash of the grayscale image."""
    gray = pixels.astype(np.int64).sum(axis=2)
    h, w = gray.shape
    ys = np.linspace(0, h, 9).astype(int)
    xs = np.linspace(0, w, 9).astype(int)
    cells = np.zeros((8, 8), dtype=np.int64)
    for r in range(8):
        for c in range(8):
            block = gray[ys[r]:max(ys[r + 1], ys[r] + 1),
                         xs[c]:max(xs[c + 1], xs[c] + 1)]
            cells[r, c] = int(block.mean())
    bits = (cells > cells.mean()).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def make_images_table(n: int, seed: int = 42) -> pa.Table:
    return make_images_table_range(0, n, seed)


def make_images_table_range(start: int, end: int, seed: int = 42) -> pa.Table:
    """Rows [start, end): per-index seeding makes sharded generation
    identical to one-shot generation."""
    ids, blobs, ws, hs, fmts, captions, phashes = [], [], [], [], [], [], []
    for i in range(start, end):
        rng = _rng(seed, i)
        w = int(rng.integers(16, 64))
        h = int(rng.integers(16, 64))
        px = make_pixels(seed, i, w, h)
        k = int(rng.integers(4, 9))
        widx = rng.integers(0, len(WORDS), size=k)
        ids.append(f"img_{i:012d}")
        blobs.append(encode_raw(px))
        ws.append(w)
        hs.append(h)
        fmts.append("raw")
        captions.append(" ".join(WORDS[j] for j in widx))
        phashes.append(phash64(px))
    return pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "w": pa.array(ws, pa.int32()),
        "h": pa.array(hs, pa.int32()),
        "fmt": pa.array(fmts, pa.string()),
        "caption": pa.array(captions, pa.string()),
        "phash": pa.array(phashes, pa.int64()),
    })


def neardup_pixels(index: int, seed: int = 43) -> tuple:
    """Pixels for the NEAR-DUP image corpus: indices with i % 3 == 2
    are perturbed copies of image i-1 (uniform ±16 noise on ~10% of
    pixels — the 8x8 mean-threshold phash flips only a few bits), so
    the corpus carries deterministic small-Hamming pairs for the
    perceptual-hash dedup pipeline. Returns (w, h, pixels)."""
    base = index - 1 if index % 3 == 2 else index
    rng = _rng(seed, base)
    w = int(rng.integers(16, 64))
    h = int(rng.integers(16, 64))
    px = make_pixels(seed, base, w, h)
    if index % 3 == 2:
        prng = _rng(seed, 1_000_000 + index)
        mask = prng.random((h, w, 1)) < 0.10
        noise = prng.integers(-16, 17, size=(h, w, 3))
        px = np.clip(px.astype(np.int64) + noise * mask,
                     0, 255).astype(np.uint8)
    return w, h, px


def make_neardup_images_table_range(start: int, end: int,
                                    seed: int = 43) -> pa.Table:
    """Near-dup image-table shard [start, end): same schema as
    make_images_table_range, pixels from neardup_pixels. Per-index
    seeding keeps sharded generation identical to one-shot."""
    ids, blobs, ws, hs, fmts, phashes = [], [], [], [], [], []
    for i in range(start, end):
        w, h, px = neardup_pixels(i, seed)
        ids.append(i)
        blobs.append(encode_raw(px))
        ws.append(w)
        hs.append(h)
        fmts.append("raw")
        phashes.append(phash64(px))
    return pa.table({
        "idx": pa.array(ids, pa.int64()),
        "bytes": pa.array(blobs, pa.binary()),
        "w": pa.array(ws, pa.int32()),
        "h": pa.array(hs, pa.int32()),
        "fmt": pa.array(fmts, pa.string()),
        "phash": pa.array(phashes, pa.int64()),
    })


# ---------------------------------------------------------------------------
# Derived polygon annotations (deterministic from image index)
# ---------------------------------------------------------------------------

GRID_STEP = 4096  # world-grid placement pitch per image
SCALE = 16        # pixel -> int world units


def star_contour(cx: int, cy: int, r0: float, r1: float, corners: int,
                 angle: float) -> list:
    """Rotating star polygon (dynamic_tests.rs:24-53 family), quantized."""
    pts = []
    step = math.pi / corners
    a = angle
    for _ in range(corners):
        pts.append((cx + int(r0 * math.cos(a)), cy + int(r0 * math.sin(a))))
        a += step
        pts.append((cx + int(r1 * math.cos(a)), cy + int(r1 * math.sin(a))))
        a += step
    return pts


def image_annotations(index: int, w: int, h: int) -> tuple:
    """(subject_shape, clip_shape) for one image: subject = pixel
    footprint rect on the global grid; clip = star rotated by a
    deterministic angle. Shapes are contour lists."""
    gx = (index % 1024) * GRID_STEP
    gy = (index // 1024) * GRID_STEP
    x1 = gx + w * SCALE
    y1 = gy + h * SCALE
    subject = [[(gx, gy), (x1, gy), (x1, y1), (gx, y1)]]
    cx = (gx + x1) // 2
    cy = (gy + y1) // 2
    r0 = max(w, h) * SCALE * 0.7
    r1 = r0 * 0.45
    angle = (index % 628) / 100.0
    corners = 5 + (index % 4)
    clip = [star_contour(cx, cy, r0, r1, corners, angle)]
    return subject, clip


def annotations_for_batch(indices, ws, hs):
    """Vector-friendly helper: returns parallel lists of nested-list
    shapes for a batch of images."""
    subs, clips = [], []
    for i, w, h in zip(indices, ws, hs):
        s, c = image_annotations(int(i), int(w), int(h))
        subs.append(s)
        clips.append(c)
    return subs, clips
