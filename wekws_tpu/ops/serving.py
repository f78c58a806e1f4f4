"""Fused serving forward: KWSModel inference via Pallas backbones.

Rebuilds the KWSModel forward (cmvn -> preprocessing -> backbone ->
classifier -> activation) around a whole-backbone Pallas kernel —
``fused_mdtc_forward`` (ops/fused_mdtc.py) or ``fused_fsmn_layers``
(ops/fused_fsmn.py) — so the backbone runs as one VMEM-resident
program, 1.3-1.8x lower latency than the XLA path at streaming batch
sizes (PERF.md).  Supported heads: linear (wake word), identity
(CTC), element MLP; other configs fall back to ``model.apply``.
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from wekws_tpu.models.fsmn import FSMN
from wekws_tpu.models.kws_model import KWSModel, mask_padding
from wekws_tpu.models.mdtc import MDTC
from wekws_tpu.models.tcn import TCN
from wekws_tpu.models.subsampling import (
    LinearSubsampling1,
    NoSubsampling,
)
from wekws_tpu.ops.fused_fsmn import (
    extract_fsmn_weights,
    fused_fsmn_layers,
    init_fsmn_cache,
)
from wekws_tpu.ops.fused_mdtc import (
    extract_mdtc_weights,
    fused_mdtc_forward,
    fused_mdtc_stream,
    init_stream_cache,
)
from wekws_tpu.ops.fused_tcn import (
    extract_ds_tcn_weights,
    fused_ds_tcn,
    init_tcn_cache,
)


def _head_weights(clf, params):
    """Classifier -> [(W, b, act)] or None when unsupported."""
    from wekws_tpu.models.classifier import (
        ElementClassifier, IdentityClassifier, LinearClassifier,
    )

    cp = params.get("classifier", {})
    if isinstance(clf, LinearClassifier):
        return [(jnp.asarray(cp["linear"]["kernel"]),
                 jnp.asarray(cp["linear"]["bias"]), "none")]
    if isinstance(clf, ElementClassifier):
        return [
            (jnp.asarray(cp["mlp"]["fc1"]["kernel"]),
             jnp.asarray(cp["mlp"]["fc1"]["bias"]), "relu"),
            (jnp.asarray(cp["mlp"]["fc2"]["kernel"]),
             jnp.asarray(cp["mlp"]["fc2"]["bias"]), "none"),
        ]
    if isinstance(clf, IdentityClassifier):
        return []
    return None


def _cmvn_weights(model):
    if model.global_cmvn is None:
        return None, None
    mean = jnp.asarray(model.global_cmvn.mean, jnp.float32)
    istd = (
        jnp.asarray(model.global_cmvn.istd, jnp.float32)
        if model.global_cmvn.norm_var
        else jnp.ones_like(mean)
    )
    return mean, istd


def _build_fused_fsmn(model, variables, softmax, streaming):
    """Forward/step builder for the fused FSMN path."""
    clf_head = _head_weights(model.classifier, variables["params"])
    if clf_head is None:
        return None
    prep = model.preprocessing
    params = jax.device_get(variables["params"])
    if isinstance(prep, LinearSubsampling1):
        p = params["preprocessing"]["proj"]
        prep_w, prep_b = jnp.asarray(p["kernel"]), jnp.asarray(p["bias"])
    elif isinstance(prep, NoSubsampling):
        prep_w = prep_b = None
    else:
        return None
    fsmn = model.backbone
    (in1_w, in1_b, in2_w, in2_b, proj_w, wl, wr, aff_w, aff_b,
     out1_w, out1_b, out2_w, out2_b) = extract_fsmn_weights(
        fsmn, params["backbone"]
    )
    cmvn_mean, cmvn_istd = _cmvn_weights(model)
    sigmoid = model.activation == "sigmoid"

    def run(x, cache, lengths=None):
        if not streaming:
            x = mask_padding(x, lengths)
        if cmvn_mean is not None:
            x = (x - cmvn_mean) * cmvn_istd
            if not streaming:
                x = mask_padding(x, lengths)
        if prep_w is not None:
            x = jax.nn.relu(x @ prep_w + prep_b)
        x = jnp.maximum((x @ in1_w + in1_b) @ in2_w + in2_b, 0.0)
        x, cache = fused_fsmn_layers(
            x, cache, proj_w, wl, wr, aff_w, aff_b,
            fsmn.lorder, fsmn.rorder, fsmn.lstride, fsmn.rstride,
        )
        x = (x @ out1_w + out1_b) @ out2_w + out2_b
        for wgt, bias, act in clf_head:
            x = x @ wgt + bias
            if act == "relu":
                x = jax.nn.relu(x)
        if sigmoid:
            x = jax.nn.sigmoid(x)
        if softmax:
            x = jax.nn.softmax(x, axis=-1)
        return x, cache

    def init_cache(batch: int = 1):
        return init_fsmn_cache(
            fsmn.fsmn_layers, batch, fsmn.layer_padding, fsmn.proj_dim
        )

    if streaming:
        step = jax.jit(run)
        return step, init_cache

    @jax.jit
    def forward(feats, lengths=None):
        out, _ = run(feats, init_cache(feats.shape[0]), lengths)
        return out

    return forward


def _build_fused_tcn(model, variables, softmax, streaming):
    """Forward/step builder for the fused DS-TCN path."""
    if not model.backbone.ds:
        return None  # full-conv CnnBlocks stay on XLA (see fused_tcn)
    clf_head = _head_weights(model.classifier, variables["params"])
    if clf_head is None:
        return None
    if not isinstance(model.preprocessing, LinearSubsampling1):
        return None
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables.get("batch_stats", {}))
    dw_w, dw_b, pw_w, pw_b, dilations = extract_ds_tcn_weights(
        model.backbone, params["backbone"], stats["backbone"]
    )
    kern = model.backbone.kernel_size
    pad_max = (kern - 1) * max(dilations)
    channels = model.backbone.channel
    prep = params["preprocessing"]["proj"]
    prep_w, prep_b = jnp.asarray(prep["kernel"]), jnp.asarray(prep["bias"])
    cmvn_mean, cmvn_istd = _cmvn_weights(model)
    sigmoid = model.activation == "sigmoid"

    def run(x, cache, lengths=None):
        if not streaming:
            x = mask_padding(x, lengths)
        if cmvn_mean is not None:
            x = (x - cmvn_mean) * cmvn_istd
            if not streaming:
                x = mask_padding(x, lengths)
        x = jax.nn.relu(x @ prep_w + prep_b)
        x, cache = fused_ds_tcn(
            x, cache, dw_w, dw_b, pw_w, pw_b, dilations, kern
        )
        for wgt, bias, act in clf_head:
            x = x @ wgt + bias
            if act == "relu":
                x = jax.nn.relu(x)
        if sigmoid:
            x = jax.nn.sigmoid(x)
        if softmax:
            x = jax.nn.softmax(x, axis=-1)
        return x, cache

    def init_cache(batch: int = 1):
        return init_tcn_cache(len(dilations), batch, pad_max, channels)

    if streaming:
        return jax.jit(run), init_cache

    @jax.jit
    def forward(feats, lengths=None):
        out, _ = run(feats, init_cache(feats.shape[0]), lengths)
        return out

    return forward


def build_fused_forward(
    model: KWSModel, variables: dict, softmax: bool = False
) -> Optional[Callable]:
    """-> f(feats, lengths) -> posteriors, or None when the model
    shape isn't supported by the fused path."""
    if isinstance(model.backbone, FSMN):
        return _build_fused_fsmn(model, variables, softmax, streaming=False)
    if isinstance(model.backbone, TCN):
        return _build_fused_tcn(model, variables, softmax, streaming=False)
    if not isinstance(model.backbone, MDTC):
        return None
    if not isinstance(model.preprocessing, LinearSubsampling1):
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

    cmvn_mean, cmvn_istd = _cmvn_weights(model)
    head_w = _head_weights(model.classifier, params)
    if head_w is None:
        return None
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
    if isinstance(model.backbone, FSMN):
        return _build_fused_fsmn(model, variables, softmax, streaming=True)
    if isinstance(model.backbone, TCN):
        return _build_fused_tcn(model, variables, softmax, streaming=True)
    if not isinstance(model.backbone, MDTC):
        return None
    if not isinstance(model.preprocessing, LinearSubsampling1):
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
    cmvn_mean, cmvn_istd = _cmvn_weights(model)
    head_w = _head_weights(model.classifier, params)
    if head_w is None:
        return None
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
