"""Reflection padding for NHWC feature maps.

The reference pads every conv input with ``nn.ReflectionPad2d`` using the
self-computed padding ``(k + (k-1)(d-1) - 1) // 2`` (reference: models.py:80,91).
On TPU this lowers to an XLA pad+gather fusion; keeping it a separate op (not
baked into conv padding) preserves reflect (not zero) semantics.
"""

from __future__ import annotations

import jax.numpy as jnp


def same_reflect_padding(kernel_size: int, dilation: int = 1) -> int:
    """Padding used by every reference conv block (reference: models.py:80)."""
    return (kernel_size + (kernel_size - 1) * (dilation - 1) - 1) // 2


def reflect_pad_2d(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Reflect-pad the H and W axes of an NHWC (or HWC) tensor.

    Matches ``torch.nn.ReflectionPad2d(pad)``: the border pixel is not
    duplicated (jnp mode='reflect').
    """
    if pad == 0:
        return x
    if x.ndim == 4:
        cfg = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    elif x.ndim == 3:
        cfg = ((pad, pad), (pad, pad), (0, 0))
    else:
        raise ValueError(f"expected NHWC or HWC, got shape {x.shape}")
    return jnp.pad(x, cfg, mode="reflect")
