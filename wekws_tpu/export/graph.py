"""Model export: lower a trained KWSModel to a portable graph artifact.

Replaces the reference's ONNX export path
(/root/reference/wekws/bin/export_onnx.py:38-94) with a self-contained
format the C++ streaming runtime executes without any inference-engine
dependency:

  <out_dir>/model.json   op graph (SSA over (T, C) buffers), cache
                         spec, feature config, and weight index
  <out_dir>/weights.bin  raw little-endian float32

BatchNorm layers are folded into their preceding convolutions at
export (inference-only artifact).  The same cache contract as training
is preserved: every causal op owns a left-context cache slot whose
length equals its receptive-field padding; metadata records total
cache_len/cache_dim like the reference embeds in ONNX metadata
(export_onnx.py:71-77).

Ops:
  dense        W (Cin,Cout), b?            attrs: act in {none,relu,sigmoid}
  conv         W (k,Cin,Cout), b?          attrs: dilation, cache, act
  dw_conv      W (k,C), b?                 attrs: dilation, cache, act
  fsmn_block   Wl (lorder,C), Wr (rorder,C) attrs: lstride, rstride, cache
  gru          Wih (Cin,3H), bih, Whh (H,3H), bhh   attrs: cache (hidden)
  add          inputs [a, b]
  relu / sigmoid / softmax
  cmvn         mean (C), istd (C)
  mean_pool / last_frame    (offline classifier heads)
"""

import json
import os
from typing import Any, Dict, List, Optional

import numpy as np

BN_EPS = 1e-5


class _Builder:
    def __init__(self):
        self.ops: List[Dict] = []
        self.weights: List[np.ndarray] = []
        self.caches: List[Dict] = []
        self.next_buf = 1  # 0 is the input

    def weight(self, arr: np.ndarray) -> Dict:
        arr = np.ascontiguousarray(np.asarray(arr, np.float32))
        offset = sum(w.size for w in self.weights)
        self.weights.append(arr)
        return {"offset": int(offset), "shape": list(arr.shape)}

    def cache(self, length: int, dim: int) -> int:
        cid = len(self.caches)
        self.caches.append({"id": cid, "len": int(length), "dim": int(dim)})
        return cid

    def op(self, op: str, inputs: List[int], attrs: Optional[Dict] = None,
           **weight_arrays) -> int:
        out = self.next_buf
        self.next_buf += 1
        entry = {"op": op, "inputs": inputs, "out": out}
        if attrs:
            entry["attrs"] = attrs
        for name, arr in weight_arrays.items():
            if arr is not None:
                entry[name] = self.weight(arr)
        self.ops.append(entry)
        return out


def _fold_bn(w, b, bn_params, bn_stats):
    from wekws_tpu.ops.fused_common import fold_bn

    return fold_bn(w, b, bn_params, bn_stats, eps=BN_EPS)


def _lower_tcn(b: _Builder, x: int, params, stats, module) -> int:
    from wekws_tpu.models.tcn import TCN

    assert isinstance(module, TCN)
    k = module.kernel_size
    for i in range(module.num_layers):
        blk = params[f"block_{i}"]
        blk_stats = stats[f"block_{i}"]
        dilation = 2 ** i
        pad = (k - 1) * dilation
        if module.ds:
            dw_w, dw_b = _fold_bn(
                blk["dw_conv"]["kernel"][:, 0, :],  # (k, C)
                blk["dw_conv"]["bias"],
                blk["dw_bn"], blk_stats["dw_bn"],
            )
            pw_w, pw_b = _fold_bn(
                blk["pw_conv"]["kernel"][0],  # (C, C)
                blk["pw_conv"]["bias"],
                blk["pw_bn"], blk_stats["pw_bn"],
            )
            cid = b.cache(pad, dw_w.shape[1])
            y = b.op("dw_conv", [x],
                     {"dilation": dilation, "cache": cid, "act": "relu"},
                     W=dw_w, b_=dw_b)
            y = b.op("dense", [y], {"act": "relu"}, W=pw_w, b_=pw_b)
        else:
            w, bias = _fold_bn(
                blk["conv"]["kernel"],  # (k, C, C)
                blk["conv"]["bias"],
                blk["bn"], blk_stats["bn"],
            )
            cid = b.cache(pad, w.shape[1])
            y = b.op("conv", [x],
                     {"dilation": dilation, "cache": cid, "act": "relu"},
                     W=w, b_=bias)
        x = b.op("add", [y, x])
    return x


def _lower_mdtc_block(b: _Builder, x: int, p, s, kernel_size, dilation,
                      residual: bool) -> int:
    pad = (kernel_size - 1) * dilation
    # conv1: dw conv -> bn (folded into dw) -> pointwise
    dw_w, dw_b = _fold_bn(
        p["conv1"]["dw_conv"]["kernel"][:, 0, :],
        p["conv1"]["dw_conv"]["bias"],
        p["conv1"]["bn"], s["conv1"]["bn"],
    )
    cid = b.cache(pad, dw_w.shape[1])
    y = b.op("dw_conv", [x],
             {"dilation": dilation, "cache": cid, "act": "none"},
             W=dw_w, b_=dw_b)
    # pointwise conv1 then bn1 (fold bn1 into pointwise) then relu
    pw_w, pw_b = _fold_bn(
        p["conv1"]["pw_conv"]["kernel"][0],
        p["conv1"]["pw_conv"]["bias"],
        p["bn1"], s["bn1"],
    )
    y = b.op("dense", [y], {"act": "relu"}, W=pw_w, b_=pw_b)
    # conv2 1x1 + bn2 folded
    c2_w, c2_b = _fold_bn(
        p["conv2"]["kernel"][0], p["conv2"]["bias"], p["bn2"], s["bn2"],
    )
    y = b.op("dense", [y], {"act": "none"}, W=c2_w, b_=c2_b)
    if residual:
        y = b.op("add", [y, x])
    return b.op("relu", [y])


def _lower_mdtc(b: _Builder, x: int, params, stats, module) -> int:
    from wekws_tpu.models.mdtc import MDTC

    assert isinstance(module, MDTC)
    k = module.kernel_size
    x = _lower_mdtc_block(
        b, x, params["preprocessor"], stats["preprocessor"], k, 1,
        module.in_channels == module.res_channels,
    )
    x = b.op("relu", [x])
    acc = None
    for si in range(module.stack_num):
        for bi in range(module.stack_size):
            name = f"stack_{si}_block_{bi}"
            x = _lower_mdtc_block(
                b, x, params[name], stats[name], k, 2 ** bi, True
            )
        acc = x if acc is None else b.op("add", [acc, x])
    return acc


def _lower_fsmn(b: _Builder, x: int, params, module) -> int:
    from wekws_tpu.models.fsmn import FSMN

    assert isinstance(module, FSMN)
    x = b.op("dense", [x], {"act": "none"},
             W=params["in_linear1"]["kernel"], b_=params["in_linear1"]["bias"])
    x = b.op("dense", [x], {"act": "relu"},
             W=params["in_linear2"]["kernel"], b_=params["in_linear2"]["bias"])
    for i in range(module.fsmn_layers):
        x = b.op("dense", [x], {"act": "none"},
                 W=params[f"layer_{i}_proj"]["kernel"], b_=None)
        fb = params[f"layer_{i}_fsmn"]
        cid = b.cache(module.layer_padding, module.proj_dim)
        wl = fb["conv_left"]["kernel"][:, 0, :]  # (lorder, C)
        wr = (fb["conv_right"]["kernel"][:, 0, :]
              if module.rorder > 0 else None)
        x = b.op("fsmn_block", [x],
                 {"lorder": module.lorder, "rorder": module.rorder,
                  "lstride": module.lstride, "rstride": module.rstride,
                  "cache": cid},
                 Wl=wl, Wr=wr)
        x = b.op("dense", [x], {"act": "relu"},
                 W=params[f"layer_{i}_affine"]["kernel"],
                 b_=params[f"layer_{i}_affine"]["bias"])
    x = b.op("dense", [x], {"act": "none"},
             W=params["out_linear1"]["kernel"],
             b_=params["out_linear1"]["bias"])
    return b.op("dense", [x], {"act": "none"},
                W=params["out_linear2"]["kernel"],
                b_=params["out_linear2"]["bias"])


def _lower_gru(b: _Builder, x: int, params, module) -> int:
    from wekws_tpu.models.gru import GRU

    assert isinstance(module, GRU)
    for i in range(module.num_layers):
        p = params[f"layer_{i}"]
        cid = b.cache(1, module.hidden_dim)  # hidden state slot
        x = b.op("gru", [x], {"cache": cid, "hidden": module.hidden_dim},
                 Wih=p["ih"]["kernel"], bih=p["ih"]["bias"],
                 Whh=p["hh_kernel"], bhh=p["hh_bias"])
    return x


def export_model(model, variables, configs: dict, out_dir: str) -> dict:
    """Lower `model` (KWSModel) with trained `variables` to an artifact.

    configs: the resolved training config (model + dataset_conf) — its
    dataset_conf is embedded so the runtime frontend matches training.
    """
    import jax

    from wekws_tpu.models.classifier import (
        ElementClassifier, GlobalClassifier, IdentityClassifier,
        LastClassifier, LinearClassifier, MLPHead,
    )
    from wekws_tpu.models.fsmn import FSMN
    from wekws_tpu.models.gru import GRU
    from wekws_tpu.models.mdtc import MDTC
    from wekws_tpu.models.subsampling import (
        Conv1dSubsampling1, LinearSubsampling1, NoSubsampling,
    )
    from wekws_tpu.models.tcn import TCN

    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables.get("batch_stats", {}))
    b = _Builder()
    x = 0

    if model.global_cmvn is not None:
        mean = np.asarray(model.global_cmvn.mean, np.float32)
        istd = np.asarray(model.global_cmvn.istd, np.float32)
        if not model.global_cmvn.norm_var:
            istd = np.ones_like(istd)
        x = b.op("cmvn", [x], {}, mean=mean, istd=istd)

    prep = model.preprocessing
    if isinstance(prep, LinearSubsampling1):
        p = params["preprocessing"]["proj"]
        x = b.op("dense", [x], {"act": "relu"}, W=p["kernel"], b_=p["bias"])
    elif isinstance(prep, Conv1dSubsampling1):
        w, bias = _fold_bn(
            params["preprocessing"]["conv"]["kernel"],
            params["preprocessing"]["conv"]["bias"],
            params["preprocessing"]["bn"],
            stats["preprocessing"]["bn"],
        )
        cid = b.cache(2, w.shape[1])
        x = b.op("conv", [x], {"dilation": 1, "cache": cid, "act": "relu"},
                 W=w, b_=bias)
    elif isinstance(prep, NoSubsampling):
        pass
    else:
        raise ValueError(f"cannot export preprocessing {type(prep)}")

    backbone = model.backbone
    bp = params.get("backbone", {})
    bs = stats.get("backbone", {})
    if isinstance(backbone, TCN):
        x = _lower_tcn(b, x, bp, bs, backbone)
    elif isinstance(backbone, MDTC):
        x = _lower_mdtc(b, x, bp, bs, backbone)
    elif isinstance(backbone, FSMN):
        x = _lower_fsmn(b, x, bp, backbone)
    elif isinstance(backbone, GRU):
        x = _lower_gru(b, x, bp, backbone)
    else:
        raise ValueError(f"cannot export backbone {type(backbone)}")

    clf = model.classifier
    cp = params.get("classifier", {})

    def lower_mlp(x, p):
        x = b.op("dense", [x], {"act": "relu"},
                 W=p["fc1"]["kernel"], b_=p["fc1"]["bias"])
        return b.op("dense", [x], {"act": "none"},
                    W=p["fc2"]["kernel"], b_=p["fc2"]["bias"])

    if isinstance(clf, LinearClassifier):
        x = b.op("dense", [x], {"act": "none"},
                 W=cp["linear"]["kernel"], b_=cp["linear"]["bias"])
    elif isinstance(clf, GlobalClassifier):
        x = b.op("mean_pool", [x])
        x = lower_mlp(x, cp["mlp"])
    elif isinstance(clf, LastClassifier):
        x = b.op("last_frame", [x])
        x = lower_mlp(x, cp["mlp"])
    elif isinstance(clf, ElementClassifier):
        x = lower_mlp(x, cp["mlp"])
    elif isinstance(clf, IdentityClassifier):
        pass
    else:
        raise ValueError(f"cannot export classifier {type(clf)}")

    if model.activation == "sigmoid":
        x = b.op("sigmoid", [x])

    cache_len = sum(c["len"] for c in b.caches)
    cache_dim = max((c["dim"] for c in b.caches), default=0)
    meta = {
        "format_version": 1,
        "output": x,
        "output_dim": int(model.odim),
        "cache_len": int(cache_len),
        "cache_dim": int(cache_dim),
        "activation": model.activation,
        "dataset_conf": configs.get("dataset_conf", {}),
        "model_conf": configs.get("model", {}),
    }
    artifact = {"meta": meta, "ops": b.ops, "caches": b.caches}

    os.makedirs(out_dir, exist_ok=True)
    flat = (
        np.concatenate([w.reshape(-1) for w in b.weights])
        if b.weights else np.zeros((0,), np.float32)
    )
    flat.astype("<f4").tofile(os.path.join(out_dir, "weights.bin"))
    with open(os.path.join(out_dir, "model.json"), "w") as f:
        json.dump(artifact, f)
    _write_text_format(artifact, os.path.join(out_dir, "model.txt"))
    return artifact


def _write_text_format(artifact: dict, path: str) -> None:
    """Line-based artifact description for the C++ runtime (no JSON
    dependency).  Grammar (space-separated, one record per line):

      version 1
      meta <output_buf> <output_dim> <cache_len> <cache_dim> <activation>
      feature <key> <value>            (repeated; frontend parameters)
      cache <id> <len> <dim>           (repeated)
      op <name> <out_buf> <n_in> <in..> [a <key> <val>]* [w <name> <off>
          <ndim> <dims..>]*
    """
    meta = artifact["meta"]
    lines = ["version 1"]
    lines.append(
        "meta {} {} {} {} {}".format(
            meta["output"], meta["output_dim"], meta["cache_len"],
            meta["cache_dim"], meta["activation"],
        )
    )
    dconf = meta.get("dataset_conf", {})
    if dconf:
        from wekws_tpu.frontend.features import frontend_from_dataset_conf

        cfg = frontend_from_dataset_conf(dconf).cfg
        lines.append(f"feature feature_type {cfg.feature_type}")
        lines.append(f"feature sample_rate {cfg.sample_rate}")
        lines.append(f"feature num_mel_bins {cfg.num_mel_bins}")
        lines.append(f"feature num_ceps {cfg.num_ceps}")
        lines.append(f"feature frame_length_ms {cfg.frame_length_ms:g}")
        lines.append(f"feature frame_shift_ms {cfg.frame_shift_ms:g}")
        ce = dconf.get("context_expansion_conf", {}) \
            if dconf.get("context_expansion") else {}
        lines.append(f"feature context_left {ce.get('left', 0)}")
        lines.append(f"feature context_right {ce.get('right', 0)}")
        lines.append(f"feature frame_skip {dconf.get('frame_skip', 1)}")
    for c in artifact["caches"]:
        lines.append(f"cache {c['id']} {c['len']} {c['dim']}")
    for entry in artifact["ops"]:
        parts = ["op", entry["op"], str(entry["out"]),
                 str(len(entry["inputs"]))]
        parts += [str(i) for i in entry["inputs"]]
        for key, val in entry.get("attrs", {}).items():
            parts += ["a", key, str(val)]
        for key, val in entry.items():
            if isinstance(val, dict) and "offset" in val:
                parts += ["w", key, str(val["offset"]),
                          str(len(val["shape"]))]
                parts += [str(d) for d in val["shape"]]
            elif isinstance(val, dict) and "int8" in val:
                qr, sr = val["int8"], val["scale"]
                parts += ["q", key, str(qr["offset"]), str(sr["offset"]),
                          str(len(qr["shape"]))]
                parts += [str(d) for d in qr["shape"]]
        lines.append(" ".join(parts))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def load_artifact(model_dir: str):
    with open(os.path.join(model_dir, "model.json")) as f:
        artifact = json.load(f)
    weights = np.fromfile(
        os.path.join(model_dir, "weights.bin"), dtype="<f4"
    )
    return artifact, weights
