"""Ray-parallel fill for ONE connected component (the Spiral regime).

The round-2 VERDICT's remaining design gap ("no decomposition of a
single connected component"): sweep-fill work on a single component
cannot be split by component, but the fill itself is a pure stab
problem — the winding below each split segment's midpoint against the
WHOLE segment table — and stab queries are data-parallel. Sharding the
(ax-sorted) query positions into contiguous COLUMN ranges and running
the existing winding engine per shard is exact by construction: each
task computes its queries' windings against all segments, and a
segment contributes tree/remnant work only for the query columns it
spans, so cross-shard replication is bounded by segments crossing
shard borders (short-segment scenes like the Spiral replicate almost
nothing — the same argument as the tiled pipeline's strips, without
the bit-model machinery, because nothing here changes geometry).

This targets the beyond-one-core regime between the raw single kernel
(one core does everything) and the full tiled pipeline (bit-exact but
~3 dataset barriers): one ``ray.put`` of the split segment table, one
wave of tasks, one concatenate. Fill is the dominant phase of large
single-component scenes (~55% of Spiral at 131k), so wall time
approaches split+extract plus fill/shards.

Reference semantics: core/fill/ in iOverlay (winding below, fill
rules); decomposition is ours — the reference is single-machine.
"""

from __future__ import annotations

import contextlib

import numpy as np
import ray

from ..geometry.kernel import Segments, _stab_windings


# measured crossover on the Spiral family: at ~200k split segments the
# task wave (put + cold-worker first-touch + per-shard setup) still
# loses to the in-process fill; at ~800k it wins ~2-4x
PARALLEL_MIN_SEGS = 400_000


@ray.remote
def _fill_shard(arrs, c0: int, c1: int, extra, lo: int, hi: int,
                with_clip: bool):
    ax, ay, bx, by, subj, clip, mx, my = arrs
    if extra is not None and len(extra):
        idx = np.concatenate((extra, np.arange(c0, c1, dtype=np.int64)))
        segs = Segments(ax[idx], ay[idx], bx[idx], by[idx],
                        subj[idx], clip[idx])
    else:
        sl = slice(c0, c1)
        segs = Segments(ax[sl], ay[sl], bx[sl], by[sl],
                        subj[sl], clip[sl])
    q = np.arange(lo, hi, dtype=np.int64)
    return _stab_windings(segs, mx, my, q, with_clip=with_clip)


def bottom_windings_ray(segs: Segments, with_clip: bool = True,
                        shards: int | None = None):
    """Sharded bottom_windings: exact same values as the sequential
    kernel (pinned by tests), fill wall time divided by the task wave.

    Each shard owns a contiguous run of ax-sorted queries, so only the
    segments whose x-span can cover one of its query columns matter:
    the driver ships per-shard windows ``[c0, c1)`` (plus the sparse
    long-segment `extra` list reaching in from the left) and the task
    slices them zero-copy out of the one shared ``ray.put``.  A
    covering segment has ``tax2 <= qmx < tbx2``, hence ``tax2 <= qhi``
    (inside ``c1``) and ``tbx2 > qlo`` (inside ``c0``'s span window or
    in `extra`), so the filtered table answers every query exactly.

    Falls back to in-process evaluation when Ray is not initialised or
    the scene is too small to amortize a task wave."""
    n = len(segs)
    mx = segs.ax + segs.bx
    my = segs.ay + segs.by
    if shards is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 1
        shards = max(1, min(32, cpus))
    if n < PARALLEL_MIN_SEGS or shards <= 1 or not ray.is_initialized():
        return _stab_windings(segs, mx, my,
                              np.arange(n, dtype=np.int64),
                              with_clip=with_clip)
    arrs_ref = ray.put((segs.ax, segs.ay, segs.bx, segs.by,
                        segs.subj, segs.clip, mx, my))
    bounds = np.linspace(0, n, shards + 1).astype(np.int64)
    tax2 = 2 * segs.ax
    tbx2 = 2 * segs.bx
    spans = tbx2 - tax2
    thr = int(np.quantile(spans, 0.999)) if n > 64 else \
        (int(spans.max()) if n else 0)
    cummax = np.maximum.accumulate(tbx2)
    futs = []
    for i in range(shards):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        if hi <= lo:
            continue
        qw = mx[lo:hi]
        qlo = int(qw.min())
        qhi = int(qw.max())
        c1 = int(np.searchsorted(tax2, qhi, side="right"))
        c0 = int(np.searchsorted(tax2, qlo - thr, side="left"))
        c0 = min(c0, c1)
        extra = None
        if c0 > 0 and cummax[c0 - 1] > qlo:
            extra = np.flatnonzero(tbx2[:c0] > qlo)
        futs.append(_fill_shard.remote(arrs_ref, c0, c1, extra,
                                       lo, hi, with_clip))
    parts = ray.get(futs)
    bot_subj = np.concatenate([p[0] for p in parts])
    bot_clip = np.concatenate([p[1] for p in parts])
    return bot_subj, bot_clip


# below this many directed edges the in-process Theta(m) walk beats a
# task wave (put + shard returns); the wave exists for the
# country-border / coastline regime where one component's edge count
# outgrows a single process
PARALLEL_LAYOUT_MIN = 6_000_000

# sharded sort_merge engages only beyond-one-process tables (A/B at
# 3.1M rows measured a wash; see sort_merge_ray)
PARALLEL_SORT_MIN = 8_000_000

# sharded mark application engages above this many marks: below it the
# in-process lexsort+scatter beats put + shard-gather overhead
# (r5 A/B: wave wins at 262k/524k/1.05M marks — 0.166->0.136,
# 0.327->0.277, 0.71->0.54 s, outputs array-identical)
PARALLEL_APPLY_MIN = 200_000


@ray.remote
def _apply_shard(arrs, marks, sel, string_clip: bool):
    ax, ay, bx, by, subj, clip = arrs
    m_idx, m_px, m_py = marks
    from ..geometry.kernel import _subdivide_marks
    segs = Segments(ax, ay, bx, by, subj, clip)
    return _subdivide_marks(segs, m_idx[sel], m_px[sel], m_py[sel],
                            string_clip)


def apply_marks_ray(segs: Segments, m_idx, m_px, m_py,
                    string_clip: bool = False,
                    shards: int | None = None):
    """Sharded _apply_marks: partition MARKS by segment-index value
    ranges (sampled splitters; ``side="right"`` keeps every mark of one
    segment in one shard, the only correctness requirement of
    _subdivide_marks), subdivide each shard's segments in a task, then
    concatenate with the untouched rows and run the one global
    sort_merge — which canonicalizes row order, so the result is
    identical to the in-process path by construction. The wave turns
    the split phase's last single-process step (the per-round
    lexsort + scatter over O(crossings) marks) into S independent
    lexsorts of ~1/S the size."""
    n_marks = len(m_idx)
    if n_marks < PARALLEL_APPLY_MIN or not ray.is_initialized():
        return None
    if shards is None:
        shards = max(1, min(32,
                            int(ray.cluster_resources().get("CPU", 8))))
    if shards <= 1:
        return None
    from ..geometry.kernel import sort_merge
    step = max(1, n_marks // 65536)
    samp = np.sort(m_idx[::step])
    cut = np.linspace(0, len(samp) - 1, shards + 1).astype(np.int64)
    splitters = np.unique(samp[cut][1:-1])
    if not len(splitters):
        return None
    arrs_ref = ray.put((segs.ax, segs.ay, segs.bx, segs.by,
                        segs.subj, segs.clip))
    marks_ref = ray.put((m_idx, m_px, m_py))
    part = np.searchsorted(splitters, m_idx, side="right")
    futs = []
    for p in range(len(splitters) + 1):
        sel = np.flatnonzero(part == p)
        if len(sel):
            futs.append(_apply_shard.remote(arrs_ref, marks_ref, sel,
                                            string_clip))
    parts = ray.get(futs)
    new = Segments(*[np.concatenate([pt[i] for pt in parts])
                     for i in range(6)])
    marked = np.zeros(len(segs), dtype=bool)
    marked[np.asarray(m_idx, dtype=np.int64)] = True
    untouched = segs.take(~marked)
    return sort_merge(Segments.concat([untouched, new]), string_clip)


@ray.remote
def _layout_shard(refs, cand, base: int):
    jump, link_of, anchor_id = refs
    from ..geometry.extract import _walk_wave
    nxt_a, alen, amin, rec = _walk_wave(
        jump, link_of, cand, base, None, None, anchor_id, record=True)
    return nxt_a, alen, amin, rec


def layout_waves(jump, link_of, cand, base, label, off, anchor_id,
                 shards: int | None = None,
                 min_edges: int | None = None):
    """Sharded anchor walk for giant single components: anchors are
    independent walkers once ``anchor_id`` is fully assigned (each
    non-anchor edge lies on exactly one anchor-to-anchor arc), so the
    wave shards the anchor set; each task replays the same lockstep walk
    read-only against the shared (jump, link_of, anchor_id) buffers
    and returns its disjoint (edge, walker, offset) writes; the driver
    scatters them into label/off. Bit-identical to the in-process walk
    by construction."""
    lim = PARALLEL_LAYOUT_MIN if min_edges is None else min_edges
    if len(jump) < lim or not ray.is_initialized():
        return None
    if shards is None:
        shards = max(1, min(32,
                            int(ray.cluster_resources().get("CPU", 8))))
    if shards <= 1 or len(cand) < 4 * shards:
        return None
    refs = ray.put((jump, link_of, anchor_id))
    bounds = np.linspace(0, len(cand), shards + 1).astype(np.int64)
    futs = [_layout_shard.remote(refs, cand[int(bounds[i]):
                                            int(bounds[i + 1])],
                                 base + int(bounds[i]))
            for i in range(shards) if bounds[i + 1] > bounds[i]]
    parts = ray.get(futs)
    nxt_a = np.concatenate([p[0] for p in parts])
    alen = np.concatenate([p[1] for p in parts])
    amin = np.concatenate([p[2] for p in parts])
    for _, _, _, (edges, wids, offs) in parts:
        label[edges] = wids
        off[edges] = offs
    return nxt_a, alen, amin


@ray.remote
def _sort_shard(arrs, idx, string_clip: bool):
    from ..geometry.kernel import sort_merge
    ax, ay, bx, by, subj, clip = arrs
    segs = Segments(ax[idx], ay[idx], bx[idx], by[idx],
                    subj[idx], clip[idx])
    out = sort_merge(segs, string_clip)
    return (out.ax, out.ay, out.bx, out.by, out.subj, out.clip)


def sort_merge_ray(segs: Segments, string_clip: bool = False,
                   shards: int | None = None):
    """Sharded sort_merge: partition rows by a-endpoint key range
    (sampled splitters; ``searchsorted(side="right")`` sends every copy
    of an equal key to the same shard, so the per-shard merge sees all
    its duplicates), sort+merge each shard in a task, concatenate in
    shard order. The result table and row order are identical to the
    global sort_merge — both are (akey, bkey)-sorted with duplicates
    summed — because the shard ranges tile the key space in order.

    Threshold: an interleaved A/B at 3.1M rows measured a wash (the
    in-process lexsort ~0.8 s vs put + slice + gather overhead), so
    the wave only engages for tables beyond what one process sorts
    comfortably — the same beyond-one-node rationale as the layout
    wave. Returns None below the threshold."""
    n = len(segs)
    if n < PARALLEL_SORT_MIN or not ray.is_initialized():
        return None
    if shards is None:
        shards = max(1, min(32,
                            int(ray.cluster_resources().get("CPU", 8))))
    if shards <= 1:
        return None
    B = np.int64(1 << 30)
    akey = ((segs.ax + B) << np.int64(31)) | (segs.ay + B)
    step = max(1, n // 65536)
    samp = np.sort(akey[::step])
    cut = np.linspace(0, len(samp) - 1, shards + 1).astype(np.int64)
    splitters = np.unique(samp[cut][1:-1])
    if not len(splitters):
        return None
    part = np.searchsorted(splitters, akey, side="right")
    arrs_ref = ray.put((segs.ax, segs.ay, segs.bx, segs.by,
                        segs.subj, segs.clip))
    futs = []
    for p in range(len(splitters) + 1):
        idx = np.flatnonzero(part == p)
        if len(idx):
            futs.append(_sort_shard.remote(arrs_ref, idx, string_clip))
    parts = ray.get(futs)
    return Segments(*[np.concatenate([p[i] for p in parts])
                      for i in range(6)])


@contextlib.contextmanager
def parallel_fill(shards: int | None = None):
    """Install the sharded fill for the enclosed kernel calls:

        with parallel_fill():
            shapes = float_overlay([spiral_path], [], "subject",
                                   "nonzero")

    The float facade is untouched — the hooks replace bottom_windings'
    in-process stab, _find_marks' banded enumeration, _apply_marks'
    subdivision, sort_merge's exchange and the extraction walk's first
    anchor wave with task waves (each gated by its own size threshold),
    so results are pinned identical by the kernel and parity tests."""
    from ..geometry import extract, kernel
    prev = kernel.PARALLEL_FILL
    prev_m = kernel.PARALLEL_MARKS
    prev_l = extract.PARALLEL_LAYOUT
    kernel.PARALLEL_FILL = \
        lambda segs, with_clip: bottom_windings_ray(segs, with_clip,
                                                    shards)
    kernel.PARALLEL_MARKS = \
        lambda segs, radius: find_marks_ray(segs, radius, shards)
    extract.PARALLEL_LAYOUT = \
        lambda *a: layout_waves(*a, shards=shards)
    prev_s = kernel.PARALLEL_SORT
    kernel.PARALLEL_SORT = \
        lambda segs, sc: sort_merge_ray(segs, sc, shards)
    prev_a = kernel.PARALLEL_APPLY
    kernel.PARALLEL_APPLY = \
        lambda segs, i, x, y, sc: apply_marks_ray(segs, i, x, y, sc,
                                                  shards)
    try:
        yield
    finally:
        kernel.PARALLEL_FILL = prev
        kernel.PARALLEL_MARKS = prev_m
        extract.PARALLEL_LAYOUT = prev_l
        kernel.PARALLEL_SORT = prev_s
        kernel.PARALLEL_APPLY = prev_a


def parallel_overlay(subj, clip, rule, fill_rule="nonzero",
                     shards: int | None = None, **options):
    """float_overlay with the FILL phase as a Ray task wave — the
    middle path between the raw single kernel (one core does the whole
    component) and the fully tiled pipeline (bit-exact but ~3 dataset
    barriers)."""
    from ..geometry.float_api import float_overlay
    with parallel_fill(shards):
        return float_overlay(subj, clip, rule, fill_rule, **options)


# ---------------------------------------------------------------------------
# Sharded split: fan the banded candidate enumeration out by band range
# ---------------------------------------------------------------------------

@ray.remote
def _marks_shard(arrs, radius: int, lo: int, hi: int, idx,
                 ctx):
    ax, ay, bx, by, subj, clip = arrs
    from ..geometry.kernel import _find_marks
    if idx is None:
        # select in-task: any segment whose y-extent overlaps a band in
        # [lo, hi).  Band membership depends only on (y0, h) and the
        # segment's own y-extent, so the subset is identical to the
        # old driver-side pre-selection — but the 32 O(n) selection
        # scans now run in PARALLEL across the wave instead of
        # sequentially on the driver (~0.4 s at Spiral 524k).
        _, y0, h = ctx
        ymin = np.minimum(ay, by)
        ymax = np.maximum(ay, by)
        idx = np.flatnonzero(((ymax - y0) // h >= lo)
                             & ((ymin - y0) // h < hi))
        if not len(idx):
            z = np.zeros(0, np.int64)
            return z, z.copy(), z.copy(), False
    segs = Segments(ax[idx], ay[idx], bx[idx], by[idx],
                    subj[idx], clip[idx])
    m_idx, m_px, m_py, any_round = _find_marks(
        segs, radius, band_range=(lo, hi), banded_ctx=ctx)
    return idx[m_idx], m_px, m_py, any_round


def find_marks_ray(segs: Segments, radius: int, shards: int | None = None):
    """Sharded _find_marks for the banded regime: each task enumerates
    AND classifies its band range (bands are independent — a pair is
    emitted only in band max(bmin_i, bmin_j)); the driver concatenates
    marks in band order, which is exactly the full enumeration's
    emission order.

    Each task selects its own segment subset (any segment whose
    y-extent overlaps a band in the range) from the one shared
    ``ray.put`` table — the selection scans run in parallel across the
    wave instead of sequentially on the driver — and receives the
    full-table band geometry so the subset bands identically to the
    full enumeration.  Returned mark indices are mapped back through
    the subset's original-index array in-task.  Returns None (fall
    through to the in-process path) for non-banded plans or small
    scenes."""
    from ..geometry.kernel import _pair_plan
    n = len(segs)
    if n < PARALLEL_MIN_SEGS or not ray.is_initialized():
        return None
    mode, B = _pair_plan(segs)
    if mode != "banded":
        return None
    if shards is None:
        shards = max(1, min(32,
                            int(ray.cluster_resources().get("CPU", 8))))
    if shards <= 1 or B < 2 * shards:
        return None
    ymin = np.minimum(segs.ay, segs.by)
    ymax = np.maximum(segs.ay, segs.by)
    y0 = int(ymin.min())
    y1 = int(ymax.max())
    h = max(1, (y1 - y0 + B) // B)
    ctx = (B, y0, h)
    arrs_ref = ray.put((segs.ax, segs.ay, segs.bx, segs.by,
                        segs.subj, segs.clip))
    bounds = np.linspace(0, B + 1, shards + 1).astype(np.int64)
    futs = []
    for i in range(shards):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        if hi <= lo:
            continue
        futs.append(_marks_shard.remote(arrs_ref, radius, lo, hi,
                                        None, ctx))
    parts = ray.get(futs)
    if not parts:
        z = np.zeros(0, np.int64)
        return z, z.copy(), z.copy(), False
    m_idx = np.concatenate([p[0] for p in parts])
    m_px = np.concatenate([p[1] for p in parts])
    m_py = np.concatenate([p[2] for p in parts])
    any_round = any(p[3] for p in parts)
    return m_idx, m_px, m_py, any_round
