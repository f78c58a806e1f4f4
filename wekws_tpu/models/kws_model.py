"""KWS model composition and config-driven factory.

Composition matches the reference KWSModel
(/root/reference/wekws/model/kws_model.py:33-214):
optional GlobalCMVN -> preprocessing -> backbone(+cache) -> classifier
-> activation (sigmoid for wake word, identity for CE/CTC), with a
softmax variant used by the CTC export path (kws_model.py:78-90).

Differences (TPU-first, intentional):
* the streaming cache is a pytree, not one concatenated tensor
  (see models/cache.py for the packed form);
* ``lengths`` flows into the classifier so pooling ignores padding;
* features beyond ``lengths`` are zero-masked before the network, which
  reproduces the reference's zero-padded batches exactly (its BatchNorm
  statistics see zero padding) while letting us compute features on
  device over the padded batch.
"""

import sys
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from wekws_tpu.frontend.cmvn import load_cmvn
from wekws_tpu.models.classifier import (
    ElementClassifier,
    GlobalClassifier,
    IdentityClassifier,
    LastClassifier,
    LinearClassifier,
)
from wekws_tpu.models.cmvn import GlobalCMVN
from wekws_tpu.models.fsmn import FSMN
from wekws_tpu.models.gru import GRU
from wekws_tpu.models.mdtc import MDTC
from wekws_tpu.models.subsampling import (
    Conv1dSubsampling1,
    LinearSubsampling1,
    NoSubsampling,
)
from wekws_tpu.models.tcn import TCN


def mask_padding(x: jnp.ndarray, lengths: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Zero features past each utterance's length (pad frames)."""
    if lengths is None:
        return x
    t = x.shape[1]
    mask = jnp.arange(t)[None, :] < lengths[:, None]
    return jnp.where(mask[:, :, None], x, 0.0)


class KWSModel(nn.Module):
    idim: int
    odim: int
    hdim: int
    global_cmvn: Optional[GlobalCMVN]
    preprocessing: nn.Module
    backbone: nn.Module
    classifier: nn.Module
    activation: str = "sigmoid"  # 'sigmoid' | 'identity'

    def init_cache(self, batch_size: int, dtype=jnp.float32):
        return self.backbone.init_cache(batch_size, dtype)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        cache=None,
        lengths: Optional[jnp.ndarray] = None,
        train: bool = False,
        softmax: bool = False,
    ):
        x = mask_padding(x, lengths)
        if self.global_cmvn is not None:
            x = self.global_cmvn(x)
            x = mask_padding(x, lengths)
        x = self.preprocessing(x, train=train)
        x, out_cache = self.backbone(x, cache, train=train)
        x = self.classifier(x, lengths=lengths, train=train)
        if self.activation == "sigmoid":
            x = nn.sigmoid(x)
        if softmax:
            x = nn.softmax(x, axis=-1)
        return x, out_cache


def init_model(configs: dict) -> KWSModel:
    """Build a KWSModel from a wekws-style resolved ``model`` config.

    Schema parity with /root/reference/wekws/model/kws_model.py:97-214.
    """
    cmvn_conf = configs.get("cmvn", {})
    global_cmvn = None
    if cmvn_conf.get("cmvn_file") is not None:
        mean, istd = load_cmvn(cmvn_conf["cmvn_file"])
    elif cmvn_conf.get("mean") is not None:
        # inline stats (tests / programmatic use)
        mean = np.asarray(cmvn_conf["mean"], np.float32)
        istd = np.asarray(cmvn_conf["istd"], np.float32)
    else:
        mean = istd = None
    if mean is not None:
        input_dim_cfg = configs.get("input_dim")
        if (
            input_dim_cfg
            and len(mean) != input_dim_cfg
            and input_dim_cfg % len(mean) == 0
        ):
            # context-expanded input: tile per-frame stats across the
            # splice window (the Kaldi Splice semantics of
            # /root/reference/wekws/utils/cmvn.py:48-93)
            reps = input_dim_cfg // len(mean)
            mean = np.tile(mean, reps)
            istd = np.tile(istd, reps)
        global_cmvn = GlobalCMVN(
            mean=np.asarray(mean),
            istd=np.asarray(istd),
            norm_var=cmvn_conf.get("norm_var", True),
        )

    input_dim = configs["input_dim"]
    output_dim = configs["output_dim"]
    hidden_dim = configs["hidden_dim"]

    prep_type = configs["preprocessing"]["type"]
    if prep_type == "linear":
        preprocessing = LinearSubsampling1(hidden_dim)
    elif prep_type == "cnn1d_s1":
        preprocessing = Conv1dSubsampling1(hidden_dim)
    elif prep_type == "none":
        preprocessing = NoSubsampling()
    else:
        raise ValueError(f"Unknown preprocessing type {prep_type}")

    # Mixed precision: 'dtype: bfloat16' in the model config runs the
    # backbone's convolutions in bf16 with f32 params and f32 BatchNorm
    # statistics (see models/mdtc.py header).  Parameters, checkpoints,
    # exports and the loss are f32 regardless.
    dtype_name = configs.get("dtype")
    compute_dtype = jnp.dtype(dtype_name) if dtype_name else None

    bconf = configs["backbone"]
    backbone_type = bconf["type"]
    if backbone_type == "gru":
        if compute_dtype is not None:
            import logging

            logging.warning(
                "model.dtype=%s is not supported for the gru backbone "
                "(sequential cell, f32 recurrence kept); training in "
                "float32", dtype_name,
            )
        backbone = GRU(hidden_dim, bconf["num_layers"])
    elif backbone_type == "tcn":
        backbone = TCN(
            num_layers=bconf["num_layers"],
            channel=hidden_dim,
            kernel_size=bconf.get("kernel_size", 8),
            dropout=bconf.get("dropout", 0.1),
            ds=bconf.get("ds", False),
            dtype=compute_dtype,
            ghost_bn=int(bconf.get("ghost_bn", 0)),
            bn_dtype=(jnp.dtype(bconf["bn_dtype"])
                      if bconf.get("bn_dtype") else None),
        )
    elif backbone_type == "mdtc":
        hidden_dim = bconf["hidden_dim"]
        backbone = MDTC(
            stack_num=bconf["num_stack"],
            stack_size=bconf["stack_size"],
            in_channels=hidden_dim,
            res_channels=hidden_dim,
            kernel_size=bconf["kernel_size"],
            causal=bconf["causal"],
            dtype=compute_dtype,
            remat=bool(bconf.get("remat", False)),
            ghost_bn=int(bconf.get("ghost_bn", 0)),
            bn_dtype=(jnp.dtype(bconf["bn_dtype"])
                      if bconf.get("bn_dtype") else None),
            fused_train=bool(bconf.get("fused_train", False)),
        )
    elif backbone_type == "fsmn":
        backbone = FSMN(
            input_affine_dim=bconf["input_affine_dim"],
            fsmn_layers=bconf["num_layers"],
            linear_dim=bconf["linear_dim"],
            proj_dim=bconf["proj_dim"],
            lorder=bconf["left_order"],
            rorder=bconf["right_order"],
            lstride=bconf["left_stride"],
            rstride=bconf["right_stride"],
            output_affine_dim=bconf["output_affine_dim"],
            output_dim=output_dim,
            dtype=compute_dtype,
        )
    else:
        raise ValueError(f"Unknown backbone type {backbone_type}")

    if "classifier" in configs:
        ctype = configs["classifier"]["type"]
        dropout = configs["classifier"].get("dropout", 0.1)
        if ctype == "global":
            classifier = GlobalClassifier(output_dim, dropout)
        elif ctype == "last":
            classifier = LastClassifier(output_dim, dropout)
        elif ctype == "element":
            classifier = ElementClassifier(output_dim, dropout)
        elif ctype == "identity":
            classifier = IdentityClassifier()
        else:
            raise ValueError(f"Unknown classifier type {ctype}")
        activation = "identity"
    else:
        classifier = LinearClassifier(output_dim)
        activation = "sigmoid"

    if "activation" in configs:
        atype = configs["activation"]["type"]
        if atype != "identity":
            raise ValueError(f"Unknown activation type {atype}")
        activation = "identity"

    return KWSModel(
        idim=input_dim,
        odim=output_dim,
        hdim=hidden_dim,
        global_cmvn=global_cmvn,
        preprocessing=preprocessing,
        backbone=backbone,
        classifier=classifier,
        activation=activation,
    )
