"""Output classifiers.

Mirrors the reference's classifier heads
(/root/reference/wekws/model/classifier.py:19-67 and the MLP factory at
kws_model.py:181-183): pooled / last-frame / per-frame application of a
small MLP, plus a bare Linear head for wake-word (sigmoid) models.
"""

import flax.linen as nn
import jax.numpy as jnp


class MLPHead(nn.Module):
    """Dense(hdim -> 64) -> ReLU -> Dropout -> Dense(64 -> odim)."""

    output_dim: int
    hidden: int = 64
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.output_dim, name="fc2")(x)


class GlobalClassifier(nn.Module):
    """Mean-pool over time, then MLP.

    Padded frames are excluded from the mean when ``lengths`` is given
    (the reference pools over padding too; masking is strictly better
    and matches its zero-padded batches when features are zero-masked).
    """

    output_dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, lengths=None, train: bool = False
    ) -> jnp.ndarray:
        if lengths is None:
            pooled = jnp.mean(x, axis=1)
        else:
            t = x.shape[1]
            mask = (
                jnp.arange(t)[None, :] < lengths[:, None]
            ).astype(x.dtype)  # (B, T)
            pooled = jnp.sum(x * mask[:, :, None], axis=1) / jnp.maximum(
                jnp.sum(mask, axis=1, keepdims=True), 1.0
            )
        return MLPHead(self.output_dim, dropout=self.dropout, name="mlp")(
            pooled, train
        )


class LastClassifier(nn.Module):
    """Classify from the last (valid) frame."""

    output_dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, lengths=None, train: bool = False
    ) -> jnp.ndarray:
        if lengths is None:
            last = x[:, -1, :]
        else:
            idx = jnp.clip(lengths - 1, 0, x.shape[1] - 1)
            last = jnp.take_along_axis(
                x, idx[:, None, None].astype(jnp.int32), axis=1
            )[:, 0, :]
        return MLPHead(self.output_dim, dropout=self.dropout, name="mlp")(
            last, train
        )


class ElementClassifier(nn.Module):
    """Per-frame MLP classification."""

    output_dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, lengths=None, train: bool = False
    ) -> jnp.ndarray:
        return MLPHead(self.output_dim, dropout=self.dropout, name="mlp")(
            x, train
        )


class LinearClassifier(nn.Module):
    """Bare per-frame Linear head (wake-word default)."""

    output_dim: int

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, lengths=None, train: bool = False
    ) -> jnp.ndarray:
        return nn.Dense(self.output_dim, name="linear")(x)


class IdentityClassifier(nn.Module):
    """Pass-through (CTC models where the backbone emits logits)."""

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, lengths=None, train: bool = False
    ) -> jnp.ndarray:
        return x
