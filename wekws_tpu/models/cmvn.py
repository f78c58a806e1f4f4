"""Global CMVN as a model-level constant transform.

Semantics match the reference's GlobalCMVN buffer module
(/root/reference/wekws/model/cmvn.py:19-48): ``(x - mean) * istd`` with
precomputed statistics.  Stats are stored as fixed (non-trainable)
module constants, baked into the jitted computation.
"""

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class GlobalCMVN(nn.Module):
    mean: np.ndarray
    istd: np.ndarray
    norm_var: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x - jnp.asarray(self.mean, x.dtype)
        if self.norm_var:
            x = x * jnp.asarray(self.istd, x.dtype)
        return x
