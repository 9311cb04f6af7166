"""glibc malloc tuning for allocation-heavy numpy kernels.

The vectorized kernels allocate many tens-of-MB temporaries per batch.
glibc serves any request above M_MMAP_THRESHOLD (dynamically capped at
32 MB) with a private mmap and munmaps it on free, so every kernel
invocation re-faults the same pages.  On bare metal that is a minor
cost; on micro-VM hosts with assisted paging a first-touch fault is
orders of magnitude more expensive, and the mmap/munmap cycle was
measured at >10x the arithmetic cost of the kernels themselves
(see BASELINE.md).  Raising both the mmap threshold and the trim
threshold keeps large freed blocks on the program heap, already
faulted in, so steady-state batches allocate for free.

Bounded waste: each process retains at most its peak transient
footprint (chunked kernels bound that to a few hundred MB).  Applied
once per process at package import — Ray workers import this package
in every map task, so worker processes are covered too.
"""
from __future__ import annotations

_APPLIED = False

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3
_THRESHOLD_BYTES = 1 << 30


def tune_malloc() -> bool:
    """Raise glibc's mmap/trim thresholds (idempotent, best-effort)."""
    global _APPLIED
    if _APPLIED:
        return True
    import os
    if os.environ.get("IOVERLAY_NO_MALLOC_TUNE"):
        return False
    try:
        import ctypes
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok1 = libc.mallopt(_M_MMAP_THRESHOLD, _THRESHOLD_BYTES)
        ok2 = libc.mallopt(_M_TRIM_THRESHOLD, _THRESHOLD_BYTES)
        _APPLIED = bool(ok1) and bool(ok2)
    except Exception:
        _APPLIED = False
    return _APPLIED
