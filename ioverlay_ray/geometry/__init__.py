from .overlay import overlay, overlay_all, build_graph, simplify_shape  # noqa: F401
from . import kernel  # noqa: F401
