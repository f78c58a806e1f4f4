"""Fused serving forward: KWSModel inference via Pallas backbones.

Rebuilds the KWSModel forward (cmvn -> preprocessing -> backbone ->
classifier -> activation) around a whole-backbone Pallas kernel —
``fused_mdtc_forward`` (ops/fused_mdtc.py), ``fused_fsmn_layers``
(ops/fused_fsmn.py), or ``fused_ds_tcn`` (ops/fused_tcn.py) — so the
backbone runs as one VMEM-resident program, 1.3-1.8x lower latency
than the XLA path at streaming batch sizes (PERF.md).  Supported
heads: linear (wake word), identity (CTC), element MLP; other configs
fall back to ``model.apply``.

Every backbone builder only supplies a ``backbone_fn(x, cache)`` and a
cache constructor; the surrounding pipeline (padding mask, cmvn,
linear-subsampling relu, classifier head, sigmoid/softmax) is shared
in ``_make_runner`` so it cannot drift between backbones.
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp

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


def _prep_weights(model, params):
    """-> ((W, b) | (None, None), ok) for the preprocessing stage."""
    prep = model.preprocessing
    if isinstance(prep, LinearSubsampling1):
        p = params["preprocessing"]["proj"]
        return (jnp.asarray(p["kernel"]), jnp.asarray(p["bias"])), True
    if isinstance(prep, NoSubsampling):
        return (None, None), True
    return (None, None), False


def _make_runner(model, params, backbone_fn, init_cache, softmax,
                 streaming, *, require_linear_prep=False):
    """Shared pipeline around a fused backbone.

    backbone_fn: (x (B,T,D), cache) -> (x', cache').  Non-streaming
    MDTC passes the cache through untouched (its kernel is whole-
    utterance).  Returns jitted ``forward(feats, lengths)`` or, when
    streaming, ``(step(feats, cache), init_cache)``; None when the
    head/preprocessing shape is unsupported.
    """
    clf_head = _head_weights(model.classifier, params)
    if clf_head is None:
        return None
    (prep_w, prep_b), prep_ok = _prep_weights(model, params)
    if not prep_ok or (require_linear_prep and prep_w is None):
        return None
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
        x, cache = backbone_fn(x, cache)
        for wgt, bias, act in clf_head:
            x = x @ wgt + bias
            if act == "relu":
                x = jax.nn.relu(x)
        if sigmoid:
            x = jax.nn.sigmoid(x)
        if softmax:
            x = jax.nn.softmax(x, axis=-1)
        return x, cache

    if streaming:
        return jax.jit(run), init_cache

    @jax.jit
    def forward(feats, lengths=None):
        out, _ = run(feats, init_cache(feats.shape[0]), lengths)
        return out

    return forward


def _build_fused_fsmn(model, variables, softmax, streaming):
    """Forward/step builder for the fused FSMN path."""
    params = jax.device_get(variables["params"])
    fsmn = model.backbone
    (in1_w, in1_b, in2_w, in2_b, proj_w, wl, wr, aff_w, aff_b,
     out1_w, out1_b, out2_w, out2_b) = extract_fsmn_weights(
        fsmn, params["backbone"]
    )

    def backbone_fn(x, cache):
        x = jnp.maximum((x @ in1_w + in1_b) @ in2_w + in2_b, 0.0)
        x, cache = fused_fsmn_layers(
            x, cache, proj_w, wl, wr, aff_w, aff_b,
            fsmn.lorder, fsmn.rorder, fsmn.lstride, fsmn.rstride,
        )
        x = (x @ out1_w + out1_b) @ out2_w + out2_b
        return x, cache

    def init_cache(batch: int = 1):
        return init_fsmn_cache(
            fsmn.fsmn_layers, batch, fsmn.layer_padding, fsmn.proj_dim
        )

    return _make_runner(
        model, params, backbone_fn, init_cache, softmax, streaming
    )


def _build_fused_tcn(model, variables, softmax, streaming):
    """Forward/step builder for the fused DS-TCN path."""
    if not model.backbone.ds:
        return None  # full-conv CnnBlocks stay on XLA (see fused_tcn)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables.get("batch_stats", {}))
    dw_w, dw_b, pw_w, pw_b, dilations = extract_ds_tcn_weights(
        model.backbone, params["backbone"], stats["backbone"]
    )
    kern = model.backbone.kernel_size
    pad_max = (kern - 1) * max(dilations)
    channels = model.backbone.channel

    def backbone_fn(x, cache):
        return fused_ds_tcn(
            x, cache, dw_w, dw_b, pw_w, pw_b, dilations, kern
        )

    def init_cache(batch: int = 1):
        return init_tcn_cache(len(dilations), batch, pad_max, channels)

    return _make_runner(
        model, params, backbone_fn, init_cache, softmax, streaming,
        require_linear_prep=True,
    )


def _build_fused_mdtc(model, variables, softmax, streaming):
    """Forward/step builder for the fused MDTC path."""
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

    if streaming:
        def backbone_fn(x, cache):
            return fused_mdtc_stream(
                x, cache, dw_w, dw_b, pw1_w, pw1_b, pw2_w, pw2_b,
                dilations, kern, stack_size,
            )
    else:
        def backbone_fn(x, cache):
            # whole-utterance kernel: internally zero-padded, no cache
            out = fused_mdtc_forward(
                x, dw_w, dw_b, pw1_w, pw1_b, pw2_w, pw2_b,
                dilations, kern, stack_size,
            )
            return out, cache

    def init_cache(batch: int = 1):
        if not streaming:
            return None
        return init_stream_cache(len(dilations), batch, pad_max, channels)

    return _make_runner(
        model, params, backbone_fn, init_cache, softmax, streaming,
        require_linear_prep=True,
    )


_BUILDERS = (
    (FSMN, _build_fused_fsmn),
    (TCN, _build_fused_tcn),
    (MDTC, _build_fused_mdtc),
)


def _dispatch(model, variables, softmax, streaming):
    for cls, builder in _BUILDERS:
        if isinstance(model.backbone, cls):
            return builder(model, variables, softmax, streaming)
    return None


def build_fused_forward(
    model: KWSModel, variables: dict, softmax: bool = False
) -> Optional[Callable]:
    """-> f(feats, lengths) -> posteriors, or None when the model
    shape isn't supported by the fused path."""
    return _dispatch(model, variables, softmax, streaming=False)


def build_fused_stream(
    model: KWSModel, variables: dict, softmax: bool = False
):
    """Streaming fused apply for KeyWordSpotter-style engines.

    -> (step_fn(feats (1,T,D), cache) -> (posteriors, cache'),
        init_cache_fn(batch) -> cache) or None when unsupported.
    The cache is the packed (L, B, pad_max, C) fused-kernel context,
    NOT the flax pytree cache."""
    return _dispatch(model, variables, softmax, streaming=True)
