"""Determinism hygiene (ref: utils/utils.py:11-18).

JAX is deterministic by construction (explicit PRNG keys, no cudnn
nondeterminism to disable); what remains is host-side numpy/python state used
by the data pipeline.
"""

from __future__ import annotations

import random

import numpy as np
import jax


def set_seed(seed: int) -> jax.Array:
    """Seed host RNGs and return the root JAX PRNG key."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
