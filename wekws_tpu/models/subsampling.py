"""Preprocessing / subsampling layers (idim -> hdim projection).

Mirrors the reference's variants
(/root/reference/wekws/model/subsampling.py:21-79): a Linear+ReLU
projection (rate 1), a Conv1d(k=3)+BN+ReLU, and identity.  The conv
variant is implemented *causally* (left-pad 2) so that it preserves
sequence length and streams correctly — the reference's valid-padding
conv silently drops two frames and breaks its own cache contract, a
defect we do not reproduce.
"""

import flax.linen as nn
import jax.numpy as jnp


class NoSubsampling(nn.Module):
    subsampling_rate: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return x


class LinearSubsampling1(nn.Module):
    """Linear + ReLU, no rate change."""

    odim: int
    subsampling_rate: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Dense(self.odim, name="proj")(x)
        return nn.relu(x)


class Conv1dSubsampling1(nn.Module):
    """Causal Conv1d(k=3) + BN + ReLU, no rate change."""

    odim: int
    subsampling_rate: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = jnp.pad(x, ((0, 0), (2, 0), (0, 0)))
        x = nn.Conv(self.odim, (3,), padding="VALID", name="conv")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="bn",
        )(x)
        return nn.relu(x)
