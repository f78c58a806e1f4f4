"""Multi-layer GRU backbone via ``lax.scan``.

Replaces the reference's ``torch.nn.GRU`` pick
(/root/reference/wekws/model/kws_model.py:128-133) with a TPU-shaped
recurrence using the same gate equations as cuDNN/torch:

    r = sigmoid(x W_ir + b_ir + h W_hr + b_hr)
    z = sigmoid(x W_iz + b_iz + h W_hz + b_hz)
    n = tanh(x W_in + b_in + r * (h W_hn + b_hn))
    h' = (1 - z) * n + z * h

TPU-first structure: the input projections of *all* timesteps are
computed up-front as one large (B*T, D) x (D, 3H) MXU matmul, so the
sequential ``lax.scan`` carries only the (B, 3H) hidden matmul per
step — the minimum serial work the recurrence allows.

Cache (streaming state) is the hidden state, shape (B, num_layers, H).
"""

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class GRULayer(nn.Module):
    hidden_dim: int

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, h0: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = self.hidden_dim
        # gate order [r, z, n] — matches torch's [W_ir|W_iz|W_in] packing.
        x_proj = nn.Dense(3 * h, name="ih")(x)  # (B, T, 3H)
        # Hidden-to-hidden weights as explicit params so the matmul can
        # live inside the lax.scan body.
        w_hh = self.param(
            "hh_kernel", nn.initializers.lecun_normal(), (h, 3 * h), x.dtype
        )
        b_hh = self.param("hh_bias", nn.initializers.zeros, (3 * h,), x.dtype)

        def step(h_prev, xp):
            h_proj = (
                jnp.dot(h_prev, w_hh, preferred_element_type=jnp.float32)
                + b_hh
            )
            xr, xz, xn = jnp.split(xp, 3, axis=-1)
            hr, hz, hn = jnp.split(h_proj, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h_new = (1.0 - z) * n + z * h_prev
            return h_new.astype(h_prev.dtype), h_new

        h_last, ys = jax.lax.scan(step, h0, jnp.swapaxes(x_proj, 0, 1))
        return jnp.swapaxes(ys, 0, 1), h_last


class GRU(nn.Module):
    hidden_dim: int
    num_layers: int

    @property
    def padding(self) -> int:
        return 0

    def init_cache(self, batch_size: int, dtype=jnp.float32):
        return jnp.zeros((batch_size, self.num_layers, self.hidden_dim), dtype)

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, cache=None, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if cache is None:
            cache = self.init_cache(x.shape[0], x.dtype)
        h_out = []
        for i in range(self.num_layers):
            x, h_last = GRULayer(self.hidden_dim, name=f"layer_{i}")(
                x, cache[:, i, :]
            )
            h_out.append(h_last)
        return x, jnp.stack(h_out, axis=1)
