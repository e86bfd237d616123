"""Two-domain paired-by-index dataset.

Replicates the reference pairing contract (reference: data_loader.py:39-69):
the dataset root holds two (or more) subdirectories; the alphabetically first
is domain 1 ("exp" for train, "label" for val/test), the second is domain 2
("raw").  Files of each domain are listed (unsorted listdir order in the
reference was nondeterministic; here both lists are sorted — a documented
determinism fix) and zipped index-by-index, truncating to the shorter list.
The per-item name is the stem of the domain-2 file.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import List, Tuple

import numpy as np
from PIL import Image

from uegan_tpu.data.files import list_image_files

try:  # cv2's libpng decode is ~4x faster than PIL and releases the GIL
    import cv2

    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False


def decode_image(path) -> Image.Image:
    """Decode an image to a PIL RGB image, using cv2 for PNG when available.

    PNG decode is bit-exact across decoders (lossless); JPEGs stay on PIL to
    keep the reference pipeline's decoder semantics (data_loader.py:30,61-62).
    """
    p = str(path)
    if _HAS_CV2 and p.lower().endswith(".png"):
        arr = cv2.imread(p, cv2.IMREAD_COLOR)
        if arr is not None:
            return Image.fromarray(arr[:, :, ::-1])  # BGR -> RGB
    return Image.open(p).convert("RGB")


class DefaultDataset:
    """Single-domain image dataset (reference: data_loader.py:21-36)."""

    def __init__(self, root):
        self.samples = sorted(list_image_files(root))

    def __len__(self) -> int:
        return len(self.samples)

    def load(self, index: int) -> Image.Image:
        return decode_image(self.samples[index])


class PairedImageDataset:
    def __init__(self, root):
        self.root = str(root)
        self.samples = self._make_pairs(self.root)

    @staticmethod
    def _make_pairs(root) -> List[Tuple[Path, Path]]:
        domains = sorted(os.listdir(root))
        fnames: List[Path] = []
        fnames2: List[Path] = []
        for idx, domain in enumerate(domains):
            cls_files = sorted(list_image_files(os.path.join(root, domain)))
            if idx == 0:
                fnames += cls_files
            elif idx == 1:
                fnames2 += cls_files
        return list(zip(fnames, fnames2))

    def __len__(self) -> int:
        return len(self.samples)

    def name(self, index: int) -> str:
        """Image name = domain-2 stem (reference: data_loader.py:58-60)."""
        fname2 = str(self.samples[index][1])
        base = fname2.split(".", 1)[0]
        return base.rsplit("/", 1)[-1]

    def load_pair(self, index: int) -> Tuple[Image.Image, Image.Image, str]:
        f1, f2 = self.samples[index]
        return decode_image(f1), decode_image(f2), self.name(index)
