"""Sequence padding masks.

Same convention as the reference (/root/reference/wekws/utils/mask.py:
18-32): ``True`` marks PADDING positions.
"""

import jax.numpy as jnp


def padding_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) lengths -> (B, max_len) bool, True where t >= length.

    ``max_len`` is static (jit-friendly) — the reference derives it from
    ``lengths.max()``, which would be a dynamic shape under jit.
    """
    seq = jnp.arange(max_len, dtype=lengths.dtype)[None, :]
    return seq >= lengths[:, None]
