"""PNG image IO with torchvision ``save_image`` semantics.

The reference saves [0,1] tensors via ``torchvision.utils.save_image``
(reference: trainer.py:180-183, tester.py:69-74), which maps to uint8 with
``round(x*255)`` after clamping.  The 8-bit PNG round-trip is part of the
reference's measured metric protocol (SURVEY.md §3.3), so quantization here
must match exactly.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from PIL import Image


def to_uint8(img01: np.ndarray) -> np.ndarray:
    """[0,1] float -> uint8 with torchvision save_image rounding.

    uint8 inputs pass through unchanged (the device-quantized fast path
    delivers PNG-ready bytes; see train/tester.py:_quantize_u8)."""
    img01 = np.asarray(img01)
    if img01.dtype == np.uint8:
        return img01
    arr = img01.astype(np.float32)
    return np.clip(np.rint(arr * 255.0), 0, 255).astype(np.uint8)


def device_quantize_u8(y):
    """[-1,1] device batch -> PNG-ready uint8 ON DEVICE, bit-identical to
    the host chain ``to_uint8`` of the [-1,1]->[0,1] denorm (every op in the
    sequence is IEEE-exact: /2 is a power-of-two divide, *255 and rint round
    identically — test-enforced in tests/test_utils_misc.py).  Fetching
    uint8 instead of bf16/f32 cuts device->host traffic 2-4x and moves the
    per-pixel denorm/round work off the (single-core) host."""
    import jax.numpy as jnp

    a = jnp.clip((y.astype(jnp.float32) + 1.0) / 2.0, 0.0, 1.0)
    return jnp.clip(jnp.rint(a * 255.0), 0.0, 255.0).astype(jnp.uint8)


def save_image(img01: np.ndarray, path: str) -> None:
    """Save a single HWC [0,1] image as PNG."""
    Image.fromarray(to_uint8(img01)).save(path, format="PNG")


def save_image_grid(imgs01: Sequence[np.ndarray], path: str, axis: int = 1) -> None:
    """Concatenate HWC images along width (axis=1) and save — the reference's
    side-by-side compare panels (reference: trainer.py:182, tester.py:73)."""
    grid = np.concatenate([np.asarray(i) for i in imgs01], axis=axis)
    save_image(grid, path)


def load_image(path: str) -> np.ndarray:
    """PNG -> HWC float32 [0,1]."""
    return np.asarray(Image.open(path).convert("RGB"), dtype=np.float32) / 255.0


def tensor2im(batch: np.ndarray, index: int = 0) -> np.ndarray:
    """[-1,1] NHWC batch -> uint8 HWC image (reference: utils.py:137-146)."""
    arr = np.asarray(batch, dtype=np.float32)
    img = arr[index]
    if img.shape[-1] == 1:
        img = np.tile(img, (1, 1, 3))
    return np.clip((img + 1.0) / 2.0 * 255.0, 0, 255).astype(np.uint8)
