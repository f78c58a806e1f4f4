"""Fused serving forward: KWSModel inference via the Pallas backbone.

Rebuilds the KWSModel forward (cmvn -> linear preprocessing -> MDTC ->
classifier -> activation) around ``fused_mdtc_forward`` so the whole
backbone runs as one kernel — 1.3-1.8x lower latency than the XLA
backbone at streaming batch sizes (PERF.md).  Supported heads: linear
(wake word), identity (CTC), element MLP; other configs fall back to
``model.apply``.
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from wekws_tpu.models.kws_model import KWSModel, mask_padding
from wekws_tpu.models.mdtc import MDTC
from wekws_tpu.models.subsampling import LinearSubsampling1
from wekws_tpu.ops.fused_mdtc import (
    extract_mdtc_weights,
    fused_mdtc_forward,
    fused_mdtc_stream,
    init_stream_cache,
)


def build_fused_forward(
    model: KWSModel, variables: dict, softmax: bool = False
) -> Optional[Callable]:
    """-> f(feats, lengths) -> posteriors, or None when the model
    shape isn't supported by the fused path."""
    from wekws_tpu.models.classifier import (
        ElementClassifier, IdentityClassifier, LinearClassifier,
    )

    if not isinstance(model.backbone, MDTC):
        return None
    if not isinstance(model.preprocessing, LinearSubsampling1):
        return None
    clf = model.classifier
    if not isinstance(
        clf, (LinearClassifier, IdentityClassifier, ElementClassifier)
    ):
        return None

    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables.get("batch_stats", {}))
    weights = extract_mdtc_weights(
        model.backbone, params["backbone"], stats["backbone"]
    )
    dw_w, dw_b, pw1_w, pw1_b, pw2_w, pw2_b, dilations = weights
    k = model.backbone.kernel_size
    stack_size = model.backbone.stack_size

    prep = params["preprocessing"]["proj"]
    prep_w = jnp.asarray(prep["kernel"])
    prep_b = jnp.asarray(prep["bias"])

    if model.global_cmvn is not None:
        cmvn_mean = jnp.asarray(model.global_cmvn.mean, jnp.float32)
        cmvn_istd = (
            jnp.asarray(model.global_cmvn.istd, jnp.float32)
            if model.global_cmvn.norm_var
            else jnp.ones_like(cmvn_mean)
        )
    else:
        cmvn_mean = cmvn_istd = None

    cp = params.get("classifier", {})
    if isinstance(clf, LinearClassifier):
        head_w = [(jnp.asarray(cp["linear"]["kernel"]),
                   jnp.asarray(cp["linear"]["bias"]), "none")]
    elif isinstance(clf, ElementClassifier):
        head_w = [
            (jnp.asarray(cp["mlp"]["fc1"]["kernel"]),
             jnp.asarray(cp["mlp"]["fc1"]["bias"]), "relu"),
            (jnp.asarray(cp["mlp"]["fc2"]["kernel"]),
             jnp.asarray(cp["mlp"]["fc2"]["bias"]), "none"),
        ]
    else:
        head_w = []
    sigmoid = model.activation == "sigmoid"

    @jax.jit
    def forward(feats, lengths=None):
        x = mask_padding(feats, lengths)
        if cmvn_mean is not None:
            x = mask_padding((x - cmvn_mean) * cmvn_istd, lengths)
        x = jax.nn.relu(x @ prep_w + prep_b)
        x = fused_mdtc_forward(
            x, dw_w, dw_b, pw1_w, pw1_b, pw2_w, pw2_b,
            dilations, k, stack_size,
        )
        for w, b, act in head_w:
            x = x @ w + b
            if act == "relu":
                x = jax.nn.relu(x)
        if sigmoid:
            x = jax.nn.sigmoid(x)
        if softmax:
            x = jax.nn.softmax(x, axis=-1)
        return x

    return forward


def build_fused_stream(
    model: KWSModel, variables: dict, softmax: bool = False
):
    """Streaming fused apply for KeyWordSpotter-style engines.

    -> (step_fn(feats (1,T,D), cache) -> (posteriors, cache'),
        init_cache_fn(batch) -> cache) or None when unsupported.
    The cache is the packed (L, B, pad_max, C) fused-kernel context,
    NOT the flax pytree cache."""
    from wekws_tpu.models.classifier import (
        ElementClassifier, IdentityClassifier, LinearClassifier,
    )

    if not isinstance(model.backbone, MDTC):
        return None
    if not isinstance(model.preprocessing, LinearSubsampling1):
        return None
    clf = model.classifier
    if not isinstance(
        clf, (LinearClassifier, IdentityClassifier, ElementClassifier)
    ):
        return None

    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables.get("batch_stats", {}))
    weights = extract_mdtc_weights(
        model.backbone, params["backbone"], stats["backbone"]
    )
    dw_w, dw_b, pw1_w, pw1_b, pw2_w, pw2_b, dilations = weights
    kern = model.backbone.kernel_size
    stack_size = model.backbone.stack_size
    pad_max = (kern - 1) * max(dilations)
    channels = model.backbone.res_channels

    prep = params["preprocessing"]["proj"]
    prep_w = jnp.asarray(prep["kernel"])
    prep_b = jnp.asarray(prep["bias"])
    if model.global_cmvn is not None:
        cmvn_mean = jnp.asarray(model.global_cmvn.mean, jnp.float32)
        cmvn_istd = (
            jnp.asarray(model.global_cmvn.istd, jnp.float32)
            if model.global_cmvn.norm_var
            else jnp.ones_like(cmvn_mean)
        )
    else:
        cmvn_mean = cmvn_istd = None
    cp = params.get("classifier", {})
    if isinstance(clf, LinearClassifier):
        head_w = [(jnp.asarray(cp["linear"]["kernel"]),
                   jnp.asarray(cp["linear"]["bias"]), "none")]
    elif isinstance(clf, ElementClassifier):
        head_w = [
            (jnp.asarray(cp["mlp"]["fc1"]["kernel"]),
             jnp.asarray(cp["mlp"]["fc1"]["bias"]), "relu"),
            (jnp.asarray(cp["mlp"]["fc2"]["kernel"]),
             jnp.asarray(cp["mlp"]["fc2"]["bias"]), "none"),
        ]
    else:
        head_w = []
    sigmoid = model.activation == "sigmoid"

    @jax.jit
    def step(feats, cache):
        x = feats
        if cmvn_mean is not None:
            x = (x - cmvn_mean) * cmvn_istd
        x = jax.nn.relu(x @ prep_w + prep_b)
        x, cache = fused_mdtc_stream(
            x, cache, dw_w, dw_b, pw1_w, pw1_b, pw2_w, pw2_b,
            dilations, kern, stack_size,
        )
        for wgt, bias, act in head_w:
            x = x @ wgt + bias
            if act == "relu":
                x = jax.nn.relu(x)
        if sigmoid:
            x = jax.nn.sigmoid(x)
        if softmax:
            x = jax.nn.softmax(x, axis=-1)
        return x, cache

    def init_cache(batch: int = 1):
        return init_stream_cache(len(dilations), batch, pad_max, channels)

    return step, init_cache
