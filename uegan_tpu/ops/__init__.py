from uegan_tpu.ops.padding import reflect_pad_2d, same_reflect_padding
from uegan_tpu.ops.resize import resize_bilinear_align_corners, upsample2x_align_corners
from uegan_tpu.ops.norms import instance_norm, feature_mean_std
from uegan_tpu.ops.pooling import avg_pool_2x2
from uegan_tpu.ops.color import denorm, rgb_to_gray

__all__ = [
    "reflect_pad_2d",
    "same_reflect_padding",
    "resize_bilinear_align_corners",
    "upsample2x_align_corners",
    "instance_norm",
    "feature_mean_std",
    "avg_pool_2x2",
    "denorm",
    "rgb_to_gray",
]
