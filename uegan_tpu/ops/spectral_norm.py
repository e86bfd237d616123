"""Spectral normalization as a pure function over explicit (u, v) state.

Parity target: ``torch.nn.utils.spectral_norm`` with ``n_power_iterations=1``,
``eps=1e-12`` (reference: models.py:185-188; enabled for D by default,
config.py:24).  The torch version mutates persistent u/v buffers each forward
in train mode; here the power-iteration state is threaded functionally through
the jitted train step (a Flax 'spectral' variable collection), which keeps the
whole GAN step a single compiled XLA program.

Gradient semantics match torch: u and v are treated as constants
(stop_gradient); sigma = u^T W v differentiates through W only.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp


def _l2normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return x / (jnp.linalg.norm(x) + eps)


def kernel_to_matrix(kernel: jnp.ndarray) -> jnp.ndarray:
    """HWIO conv kernel -> (out, in*kh*kw) matrix in torch's OIHW flatten order.

    Keeping torch's flatten order makes converted checkpoints' u/v vectors
    line up exactly.
    """
    kh, kw, cin, cout = kernel.shape
    return jnp.transpose(kernel, (3, 2, 0, 1)).reshape(cout, cin * kh * kw)


def init_uv(key: jax.Array, kernel_shape: Tuple[int, ...]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Random normalized u/v, like torch's init at wrap time."""
    kh, kw, cin, cout = kernel_shape
    ku, kv = jax.random.split(key)
    u = _l2normalize(jax.random.normal(ku, (cout,), dtype=jnp.float32))
    v = _l2normalize(jax.random.normal(kv, (cin * kh * kw,), dtype=jnp.float32))
    return u, v


def spectral_normalize(
    kernel: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    update: Union[bool, jnp.ndarray] = True,
    eps: float = 1e-12,
):
    """Normalize ``kernel`` by its leading singular value estimate.

    Returns (normalized_kernel, new_u, new_v).  With ``update=True`` one power
    iteration runs first (train-mode torch); with ``update=False`` the stored
    u/v are used as-is (eval-mode torch).
    """
    w_mat = kernel_to_matrix(kernel.astype(jnp.float32))

    def iterate(uv):
        u0, _ = uv
        v1 = _l2normalize(w_mat.T @ u0, eps)
        u1 = _l2normalize(w_mat @ v1, eps)
        return u1, v1

    if isinstance(update, bool):
        u1, v1 = iterate((u, v)) if update else (u, v)
    else:
        u1, v1 = jax.lax.cond(update, iterate, lambda uv: uv, (u, v))
    u1 = jax.lax.stop_gradient(u1)
    v1 = jax.lax.stop_gradient(v1)
    sigma = jnp.dot(u1, w_mat @ v1)
    return (kernel / sigma.astype(kernel.dtype)), u1, v1


def spectral_sigmas(
    kernel: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    n: int,
    update: bool = True,
    eps: float = 1e-12,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-forward sigmas for ``n`` sequential train-mode forwards.

    Torch's spectral norm runs one power iteration per forward, so ``n``
    forwards of the same module between weight updates see ``n`` different
    sigmas (forward i normalizes by the estimate after i iterations).  This
    returns all of them at once — the basis for running those ``n`` forwards
    as ONE batched conv on the raw kernel with per-branch output scaling
    (conv(x, W/sigma) == conv(x, W)/sigma), keeping torch-SN semantics exact.

    Returns (sigmas shaped (n,), u_n, v_n).  Gradient flows through W in each
    sigma (u_i, v_i are stop-gradient), matching torch.
    """
    w_mat = kernel_to_matrix(kernel.astype(jnp.float32))
    sigmas = []
    uu, vv = u, v
    for _ in range(n):
        if update:
            vv = jax.lax.stop_gradient(_l2normalize(w_mat.T @ uu, eps))
            uu = jax.lax.stop_gradient(_l2normalize(w_mat @ vv, eps))
        sigmas.append(jnp.dot(uu, w_mat @ vv))
    return jnp.stack(sigmas), uu, vv
