"""Streaming-cache helpers.

Backbone caches are pytrees (tuples) of per-layer left-context arrays
``(B, pad_i, D)`` (or ``(B, L, H)`` hidden state for GRU).  For export
to the single-tensor runtime interface (the reference runtime feeds one
cache tensor per step, /root/reference/runtime/core/kws/
keyword_spotting.cc:47-95) these helpers pack/unpack the pytree into a
single time-concatenated array.
"""

from typing import Sequence, Tuple

import jax.numpy as jnp


def concat_cache(cache) -> jnp.ndarray:
    """Tuple of (B, pad_i, D) -> (B, sum(pad_i), D).

    GRU hidden state (B, L, H) arrays pass through unchanged.
    """
    if isinstance(cache, jnp.ndarray):
        return cache
    return jnp.concatenate(list(cache), axis=1)


def split_cache(
    packed: jnp.ndarray, paddings: Sequence[int]
) -> Tuple[jnp.ndarray, ...]:
    """(B, sum(pad_i), D) -> tuple of (B, pad_i, D)."""
    out = []
    offset = 0
    for p in paddings:
        out.append(packed[:, offset : offset + p, :])
        offset += p
    return tuple(out)


def cache_shape(cache):
    """Total (frames, dim) footprint of a cache pytree (for metadata)."""
    if isinstance(cache, jnp.ndarray):
        return int(cache.shape[1]), int(cache.shape[2])
    frames = sum(int(c.shape[1]) for c in cache)
    dim = int(cache[0].shape[2]) if len(cache) else 0
    return frames, dim
