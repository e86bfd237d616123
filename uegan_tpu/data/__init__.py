from uegan_tpu.data.files import list_image_files
from uegan_tpu.data.dataset import PairedImageDataset
from uegan_tpu.data.pipeline import get_train_loader, get_test_loader, InputFetcher

__all__ = [
    "list_image_files",
    "PairedImageDataset",
    "get_train_loader",
    "get_test_loader",
    "InputFetcher",
]
