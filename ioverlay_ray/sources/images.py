"""Image+caption table readers (BASELINE.json input_hint).

The engine's canonical input is a table with columns
(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64) stored as Lance or Parquet. Lance is the
north-star at-rest format (trillion-row scans with column projection
and fragment-level parallelism); this container ships no ``lance``
wheel, so the Lance path is import-gated with a clear error while the
schema handling, column pruning and block sizing around it are real
and shared with the Parquet path.
"""

from __future__ import annotations

import os

IMAGE_COLUMNS = ("image_id", "bytes", "w", "h", "fmt", "caption",
                 "phash")


def _detect_format(path: str) -> str:
    if path.endswith(".lance") or os.path.isdir(
            os.path.join(path, "_versions")):
        return "lance"
    return "parquet"


def read_images(path: str, columns=None, fmt: str = "auto",
                override_num_blocks: int | None = None):
    """Image table -> ``ray.data.Dataset`` with pruned columns.

    ``fmt='auto'`` detects Lance datasets by the ``_versions``
    manifest directory (or a ``.lance`` suffix) and falls back to
    Parquet. Pass ``columns`` — geometry pipelines must never read
    the binary payload (``bytes``) they don't use.
    """
    import ray
    import ray.data

    if fmt == "auto":
        fmt = _detect_format(path)
    if columns is not None:
        unknown = set(columns) - set(IMAGE_COLUMNS)
        if unknown:
            raise ValueError(f"unknown image columns: {sorted(unknown)}")
    if override_num_blocks is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        override_num_blocks = cpus * 2
    if fmt == "lance":
        try:
            import lance  # noqa: F401
        except ImportError as exc:
            raise ImportError(
                "Lance image tables need the 'pylance' package "
                "(ray.data.read_lance); it is not installed in this "
                "environment. Convert with lance.write_dataset(...) "
                "reading the Parquet form, or pass fmt='parquet'."
            ) from exc
        return ray.data.read_lance(path, columns=list(columns)
                                   if columns else None)
    files = path
    if os.path.isdir(path):
        files = [os.path.join(path, f) for f in sorted(os.listdir(path))
                 if f.endswith(".parquet")]
    return ray.data.read_parquet(
        files, columns=list(columns) if columns else None,
        override_num_blocks=override_num_blocks)
