"""Native host runtime: ctypes bindings over libhost_ops.so.

The library auto-builds on first import (make in this directory); all entry
points degrade gracefully to numpy fallbacks when a compiler is unavailable.
"""

from lcrnet_tpu.native.host_ops import (
    grid_subsample_native,
    load_kitti_bin_native,
    native_available,
    radius_neighbors_native,
)

__all__ = [
    "grid_subsample_native",
    "radius_neighbors_native",
    "load_kitti_bin_native",
    "native_available",
]
