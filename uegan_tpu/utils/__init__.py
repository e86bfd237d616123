from uegan_tpu.utils.seed import setup_seed
from uegan_tpu.utils.folders import create_folder
from uegan_tpu.utils.image_io import load_image, save_image, save_image_grid, to_uint8

__all__ = [
    "setup_seed",
    "create_folder",
    "load_image",
    "save_image",
    "save_image_grid",
    "to_uint8",
]
