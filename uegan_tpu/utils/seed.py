"""Determinism plumbing.

The reference seeded numpy/random/torch/CUDA and forced cudnn.deterministic
(reference: utils.py:149-155, seed 1990 at config.py:36).  In JAX determinism
is structural — all device randomness flows from explicit PRNG keys threaded
through the train state — so ``setup_seed`` only seeds the host-side numpy /
python RNGs used by the input pipeline and returns the root JAX key.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def setup_seed(seed: int) -> jax.Array:
    np.random.seed(seed)
    random.seed(seed)
    return jax.random.PRNGKey(seed)
