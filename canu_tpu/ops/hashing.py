"""32-bit mixing hashes for k-mer sketching (device, branch-free)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def mix32(x: jax.Array) -> jax.Array:
    """murmur3-style finalizer: a well-dispersed bijective uint32 mix."""
    x = x.astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def hash_seeds(n: int, seed: int = 0xA5EED) -> np.ndarray:
    """n distinct uint32 seeds derived from a master seed (host)."""
    rng = np.random.default_rng(seed)
    return rng.integers(1, 2**32, size=n, dtype=np.uint32)
