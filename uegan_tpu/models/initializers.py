"""Weight initializers with torch-init parity.

The reference initializes every conv/linear weight via ``init_weights``
(reference: trainer.py:357-390) — default ``orthogonal`` with gain 0.02 and
zero bias (config.py:21).  Kernels here are HWIO; fan_in = kh*kw*cin matches
torch's (O, I, kh, kw) fan computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.nn import initializers as ji


def _xavier_normal(gain: float):
    def init(key, shape, dtype=jnp.float32):
        kh, kw, cin, cout = shape
        fan_in, fan_out = kh * kw * cin, kh * kw * cout
        std = gain * (2.0 / (fan_in + fan_out)) ** 0.5
        return std * jax.random.normal(key, shape, dtype)

    return init


def _orthogonal_torch(gain: float):
    """torch.nn.init.orthogonal_: rows of the (O, fan_in) matrix orthonormal.

    jax's orthogonal init orthogonalizes columns over the flattened leading
    axes; transposing the generated matrix reproduces torch's row convention
    (for O <= fan_in both give a semi-orthogonal factor — same distribution).
    """

    def init(key, shape, dtype=jnp.float32):
        kh, kw, cin, cout = shape
        flat = kh * kw * cin
        # generate (cout, flat) with orthonormal rows (or columns if cout>flat)
        n, m = cout, flat
        a = jax.random.normal(key, (max(n, m), min(n, m)), jnp.float32)
        q, r = jnp.linalg.qr(a)
        q = q * jnp.sign(jnp.diagonal(r))[None, :]
        q = q[: max(n, m), : min(n, m)]
        if n < m:
            q = q.T  # (n, m) with orthonormal rows
        # q is (cout, flat) in torch OIHW-flatten order -> back to HWIO
        w = q.reshape(cout, cin, kh, kw).transpose(2, 3, 1, 0)
        return (gain * w).astype(dtype)

    return init


def get_initializer(init_type: str, gain: float = 0.02):
    if init_type == "normal":
        return ji.normal(stddev=gain)
    if init_type == "xavier":
        return _xavier_normal(gain)
    if init_type == "xavier_uniform":
        return ji.glorot_uniform()
    if init_type == "kaiming":
        # torch kaiming_normal_(a=0, mode='fan_in'), leaky_relu default -> gain sqrt(2)
        return ji.he_normal()
    if init_type == "kaiming_uniform":
        return ji.he_uniform()
    if init_type == "orthogonal":
        return _orthogonal_torch(gain)
    if init_type in ("none", "", None):
        # torch Conv2d reset_parameters: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))
        return ji.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
    raise NotImplementedError(f"Initialization method [{init_type}] is not implemented")
