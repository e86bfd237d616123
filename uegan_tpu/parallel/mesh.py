"""Device-mesh construction.

The reference's only parallelism was single-process ``nn.DataParallel``
scatter/gather over <=4 GPUs (reference: trainer.py:317-321).  The TPU-native
design replaces it with a 2-axis GSPMD mesh:

- ``data``     batch-dimension sharding (gradient all-reduce rides ICI psum)
- ``spatial``  H-dimension sharding for high-res tiled inference (GSPMD
               inserts conv halo exchanges and turns GAM's global mean/std
               into cross-device reductions — the spatial analog of
               sequence/context parallelism; SURVEY.md §5)

No user-visible backend code: all collectives are compiler-inserted from
sharding annotations.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(
    n_data: int = 0,
    n_spatial: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, spatial) mesh.  ``n_data=0`` uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data <= 0:
        n_data = max(1, len(devices) // max(1, n_spatial))
    need = n_data * n_spatial
    if need > len(devices):
        raise ValueError(f"mesh {n_data}x{n_spatial} needs {need} devices, have {len(devices)}")
    arr = np.array(devices[:need]).reshape(n_data, n_spatial)
    return Mesh(arr, (DATA_AXIS, SPATIAL_AXIS))


def default_mesh(config=None) -> Mesh:
    if config is None:
        return make_mesh()
    return make_mesh(config.mesh_data, config.mesh_spatial)
