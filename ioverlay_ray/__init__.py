"""ioverlay_ray: Ray-Data-native spatial-join + tiling engine.

Re-expresses iOverlay's polygon boolean-overlay capabilities
(union/intersect/difference/xor with exact integer snap rounding) as
distributed Ray Data pipelines over Arrow tables.
"""

__version__ = "0.1.0"

from ioverlay_ray._malloc import tune_malloc as _tune_malloc

_tune_malloc()
del _tune_malloc
