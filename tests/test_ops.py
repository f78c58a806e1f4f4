"""Pallas fused-MDTC kernel parity vs the flax backbone (interpret
mode on CPU; the same kernel compiles natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from wekws_tpu.models.mdtc import MDTC
from wekws_tpu.ops import extract_mdtc_weights, fused_mdtc_forward


@pytest.mark.parametrize("stack_num,stack_size,c", [(2, 3, 64), (4, 4, 32)])
def test_fused_matches_flax(stack_num, stack_size, c):
    model = MDTC(
        stack_num=stack_num, stack_size=stack_size,
        in_channels=c, res_channels=c, kernel_size=5,
    )
    b, t = 2, 48
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, c)) * 0.5
    variables = model.init(jax.random.PRNGKey(1), x)
    # nudge batch_stats so folding is non-trivial
    stats = jax.tree_util.tree_map(
        lambda a: a + 0.1 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape)
        / max(a.size, 1),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}

    want, _ = model.apply(variables, x)
    want = np.asarray(want)

    weights = extract_mdtc_weights(
        model, variables["params"], variables["batch_stats"]
    )
    dw_w, dw_b, pw1_w, pw1_b, pw2_w, pw2_b, dilations = weights
    with pltpu.force_tpu_interpret_mode():
        got = fused_mdtc_forward(
            x, dw_w, dw_b, pw1_w, pw1_b, pw2_w, pw2_b,
            dilations, 5, stack_size,
        )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)
