from uegan_tpu.infer.tiles import enhance_tiled
from uegan_tpu.infer.spatial import enhance_spatial_sharded

__all__ = ["enhance_tiled", "enhance_spatial_sharded"]
