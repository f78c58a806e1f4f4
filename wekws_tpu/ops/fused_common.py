"""Helpers shared by the fused serving kernels.

Every fused temporal-conv backbone (MDTC, DS-TCN, FSMN) streams with
the same left-context ring cache layout, and MDTC/DS-TCN both fold
inference-time BatchNorm into the preceding conv — one definition of
each lives here so the kernels cannot drift apart.
"""

import jax.numpy as jnp
import numpy as np


def init_ring_cache(
    n_layers: int, batch: int, pad_max: int, channels: int
) -> jnp.ndarray:
    """(L, B, pad_max, C) zero left-context for a fresh stream."""
    return jnp.zeros((n_layers, batch, pad_max, channels), jnp.float32)


def fold_bn(w, b, bn_params, bn_stats, eps=1e-5):
    """Fold BN(scale,bias,mean,var) into conv/dense (w, b).

    w's last axis is the output-channel axis.  Folding is done in
    float64 so the fused weights match apply-time BN to f32 ulp."""
    gamma = np.asarray(bn_params["scale"], np.float64)
    beta = np.asarray(bn_params["bias"], np.float64)
    mean = np.asarray(bn_stats["mean"], np.float64)
    var = np.asarray(bn_stats["var"], np.float64)
    scale = gamma / np.sqrt(var + eps)
    w = np.asarray(w, np.float64) * scale
    b = np.asarray(b, np.float64) if b is not None else 0.0
    b = (b - mean) * scale + beta
    return w.astype(np.float32), b.astype(np.float32)
