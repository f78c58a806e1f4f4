"""Import a reference (wenet-e2e/wekws) PyTorch checkpoint.

Migration tooling: users of the reference framework carry their
trained models over without retraining.  Maps the reference
``KWSModel`` state_dict (torch layout, studied from
/root/reference/wekws/model/{kws_model,mdtc,tcn,fsmn,subsampling,
classifier,cmvn}.py — naming and tensor layouts only) onto this
framework's flax param/batch_stats trees:

  reference key                         -> flax path
  preprocessing.out.0.{weight,bias}        preprocessing/proj (Linear -> Dense: W.T)
  preprocessing.out.0 Conv1d + out.1 BN    preprocessing/{conv,bn}
  backbone.preprocessor.* (MDTC)           backbone/preprocessor/*
  backbone.blocks.{s}.res_blocks.{i}.*     backbone/stack_{s}_block_{i}/*
  backbone.network.{i}.cnn.{j}.* (TCN)     backbone/block_{i}/*
  backbone.in_linear1.linear.* (FSMN)      backbone/in_linear1
  backbone.fsmn.{i}.{0,1,2}.*              backbone/layer_{i}_{proj,fsmn,affine}
  backbone.weight_ih_l{k} ... (GRU)        backbone/layer_{k}/{ih,hh_*}
  classifier.linear.*                      classifier/linear
  classifier.classifier.{0,3}.*            classifier/mlp/{fc1,fc2}
  global_cmvn.{mean,istd} buffers          returned separately (constants
                                           in this framework, not params)

Tensor layout conventions (both frameworks use cross-correlation, so
no kernel flips — only axis permutations):
  Linear  (out, in)        -> Dense kernel (in, out)
  Conv1d  (out, in, k)     -> Conv kernel (k, in, out)
  dw conv (C, 1, k)        -> DepthwiseConv1d kernel (k, 1, C)
  FSMN Conv2d (C,1,order,1)-> (order, 1, C)
  GRU weight_ih (3H, in)   -> ih kernel (in, 3H)   [gate order r,z,n
  GRU weight_hh (3H, H)    -> hh_kernel (H, 3H)     matches torch]
  BatchNorm weight/bias    -> bn scale/bias (params)
  BatchNorm running_*      -> bn mean/var (batch_stats)
"""

from typing import Dict, Optional, Tuple

import numpy as np


def _t(arr) -> np.ndarray:
    return np.asarray(arr, np.float32)


def _linear(sd, prefix, bias=True):
    out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
    if bias:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _conv1d(sd, prefix):
    w = _t(sd[f"{prefix}.weight"])  # (out, in, k)
    out = {"kernel": np.transpose(w, (2, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _dw_conv1d(sd, prefix):
    w = _t(sd[f"{prefix}.weight"])  # (C, 1, k)
    out = {"kernel": np.transpose(w, (2, 1, 0))}  # (k, 1, C)
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _bn(sd, prefix):
    params = {
        "scale": _t(sd[f"{prefix}.weight"]),
        "bias": _t(sd[f"{prefix}.bias"]),
    }
    stats = {
        "mean": _t(sd[f"{prefix}.running_mean"]),
        "var": _t(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def _mdtc_block(sd, prefix):
    """Reference TCNBlock (mdtc.py:62-121) -> flax TCNBlock tree."""
    params: Dict = {"conv1": {}}
    stats: Dict = {"conv1": {}}
    params["conv1"]["dw_conv"] = _dw_conv1d(sd, f"{prefix}.conv1.conv")
    bnp, bns = _bn(sd, f"{prefix}.conv1.bn")
    params["conv1"]["bn"] = bnp
    stats["conv1"]["bn"] = bns
    params["conv1"]["pw_conv"] = _conv1d(sd, f"{prefix}.conv1.pointwise")
    for name in ("bn1", "bn2"):
        bnp, bns = _bn(sd, f"{prefix}.{name}")
        params[name] = bnp
        stats[name] = bns
    params["conv2"] = _conv1d(sd, f"{prefix}.conv2")
    return params, stats


def import_torch_checkpoint(
    state_dict: Dict[str, np.ndarray],
    model_conf: dict,
) -> Tuple[dict, dict, Optional[Tuple[np.ndarray, np.ndarray]]]:
    """Reference state_dict (torch tensors or arrays) + the model
    config -> (params, batch_stats, cmvn) for this framework's
    KWSModel.  ``cmvn`` is (mean, istd) when the checkpoint embeds
    GlobalCMVN buffers, else None (pass it via the model config's
    inline ``cmvn`` stats)."""
    sd = {
        k: (v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        for k, v in state_dict.items()
    }
    params: Dict = {}
    stats: Dict = {}

    cmvn = None
    if "global_cmvn.mean" in sd:
        cmvn = (_t(sd["global_cmvn.mean"]), _t(sd["global_cmvn.istd"]))

    prep = model_conf.get("preprocessing", {}).get("type", "none")
    if prep == "linear":
        params["preprocessing"] = {
            "proj": _linear(sd, "preprocessing.out.0")
        }
    elif prep == "cnn1d_s1":
        params["preprocessing"] = {
            "conv": _conv1d(sd, "preprocessing.out.0")
        }
        bnp, bns = _bn(sd, "preprocessing.out.1")
        params["preprocessing"]["bn"] = bnp
        stats["preprocessing"] = {"bn": bns}

    btype = model_conf["backbone"]["type"]
    bp: Dict = {}
    bs: Dict = {}
    if btype == "mdtc":
        p, s = _mdtc_block(sd, "backbone.preprocessor")
        bp["preprocessor"] = p
        bs["preprocessor"] = s
        num_stack = model_conf["backbone"]["num_stack"]
        stack_size = model_conf["backbone"]["stack_size"]
        for si in range(num_stack):
            for bi in range(stack_size):
                p, s = _mdtc_block(
                    sd, f"backbone.blocks.{si}.res_blocks.{bi}"
                )
                bp[f"stack_{si}_block_{bi}"] = p
                bs[f"stack_{si}_block_{bi}"] = s
    elif btype == "tcn":
        ds = model_conf["backbone"].get("ds", False)
        for i in range(model_conf["backbone"]["num_layers"]):
            pre = f"backbone.network.{i}.cnn"
            if ds:
                blk = {"dw_conv": _dw_conv1d(sd, f"{pre}.0"),
                       "pw_conv": _conv1d(sd, f"{pre}.3")}
                sblk = {}
                blk["dw_bn"], sblk["dw_bn"] = _bn(sd, f"{pre}.1")
                blk["pw_bn"], sblk["pw_bn"] = _bn(sd, f"{pre}.4")
            else:
                blk = {"conv": _conv1d(sd, f"{pre}.0")}
                sblk = {}
                blk["bn"], sblk["bn"] = _bn(sd, f"{pre}.1")
            bp[f"block_{i}"] = blk
            bs[f"block_{i}"] = sblk
    elif btype == "fsmn":
        bp["in_linear1"] = _linear(sd, "backbone.in_linear1.linear")
        bp["in_linear2"] = _linear(sd, "backbone.in_linear2.linear")
        bp["out_linear1"] = _linear(sd, "backbone.out_linear1.linear")
        bp["out_linear2"] = _linear(sd, "backbone.out_linear2.linear")
        for i in range(model_conf["backbone"]["num_layers"]):
            bp[f"layer_{i}_proj"] = _linear(
                sd, f"backbone.fsmn.{i}.0.linear", bias=False
            )
            fb = {}
            # FSMN memory taps: Conv2d (C, 1, order, 1) -> (order, 1, C)
            wl = _t(sd[f"backbone.fsmn.{i}.1.conv_left.weight"])
            fb["conv_left"] = {
                "kernel": np.transpose(wl[:, :, :, 0], (2, 1, 0))
            }
            rkey = f"backbone.fsmn.{i}.1.conv_right.weight"
            if rkey in sd:
                wr = _t(sd[rkey])
                fb["conv_right"] = {
                    "kernel": np.transpose(wr[:, :, :, 0], (2, 1, 0))
                }
            bp[f"layer_{i}_fsmn"] = fb
            bp[f"layer_{i}_affine"] = _linear(
                sd, f"backbone.fsmn.{i}.2.linear"
            )
    elif btype == "gru":
        for k in range(model_conf["backbone"]["num_layers"]):
            bp[f"layer_{k}"] = {
                "ih": {
                    "kernel": _t(sd[f"backbone.weight_ih_l{k}"]).T,
                    "bias": _t(sd[f"backbone.bias_ih_l{k}"]),
                },
                "hh_kernel": _t(sd[f"backbone.weight_hh_l{k}"]).T,
                "hh_bias": _t(sd[f"backbone.bias_hh_l{k}"]),
            }
    else:
        raise ValueError(f"unknown backbone type {btype}")
    params["backbone"] = bp
    if bs:
        stats["backbone"] = bs

    if "classifier.linear.weight" in sd:
        params["classifier"] = {
            "linear": _linear(sd, "classifier.linear")
        }
    elif "classifier.classifier.0.weight" in sd:
        params["classifier"] = {"mlp": {
            "fc1": _linear(sd, "classifier.classifier.0"),
            "fc2": _linear(sd, "classifier.classifier.3"),
        }}

    return params, stats, cmvn


def import_torch_file(path: str, model_conf: dict):
    """Load a reference ``.pt`` checkpoint file and convert."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k.replace("module.", "", 1): v for k, v in sd.items()}
    return import_torch_checkpoint(sd, model_conf)
