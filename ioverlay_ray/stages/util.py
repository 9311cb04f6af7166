"""Shared stage helpers."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_WORKER_CACHE: dict = {}


def _arg_key(v):
    """Stable cache key for one constructor arg. ndarrays repr with
    truncated precision (two different arrays can collide), so key them
    by a digest of their exact bytes + shape + dtype instead."""
    if isinstance(v, np.ndarray):
        a = np.ascontiguousarray(v)
        return ("__ndarray__", hashlib.sha256(a.tobytes()).hexdigest(),
                a.shape, str(a.dtype))
    if isinstance(v, (list, tuple)):
        return (type(v).__name__,) + tuple(_arg_key(x) for x in v)
    if isinstance(v, dict):
        return ("dict",) + tuple(
            (k, _arg_key(x)) for k, x in sorted(v.items()))
    return repr(v)


def stage_fn(cls, /, *args, **kwargs):
    """Task-pool form of a stage class: the instance (codec table,
    shingle/permutation caches, model weights) is built ONCE per worker
    process and cached — the same amortization as an actor's __init__ —
    but the stage reuses the cluster's already-warm workers instead of
    spinning a dedicated actor pool. On this host a fresh actor pool
    costs ~1.3-1.7 s PER map_batches CALL (cold-worker page faults, see
    NOTES; pools are torn down when the dataset finishes), which
    dominates small/medium inputs and repeated suite runs. Large
    corpora that want pinned resources and placement still pass the
    class + ``concurrency=`` directly."""
    # constructor args may be unhashable (lists, arrays); ObjectRef
    # reprs are stable per ref, ndarrays keyed by content digest
    key = (cls, _arg_key(args), _arg_key(kwargs))

    def fn(batch: pa.Table) -> pa.Table:
        st = _WORKER_CACHE.get(key)
        if st is None:
            st = cls(*args, **kwargs)
            _WORKER_CACHE[key] = st
        return st(batch)
    return fn
