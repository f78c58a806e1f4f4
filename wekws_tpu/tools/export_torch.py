"""Export this framework's checkpoint AS a reference (wenet-e2e/wekws)
PyTorch state_dict — the inverse of tools/import_torch.py, completing
the two-way migration story: models trained here load directly into
the reference's score/export/runtime tooling.

Same name mapping and tensor-layout permutations as the importer
(see its module docstring); every permutation is an involution-ish
transpose, so export(import(sd)) == sd.  Forward parity against the
actual reference implementation is pinned in
tests/test_reference_parity.py.
"""

from typing import Dict, Optional, Tuple

import numpy as np


def _t(arr) -> np.ndarray:
    return np.asarray(arr, np.float32)


def _linear(tree, prefix, out, bias=True):
    out[f"{prefix}.weight"] = _t(tree["kernel"]).T
    if bias and "bias" in tree:
        out[f"{prefix}.bias"] = _t(tree["bias"])


def _conv1d(tree, prefix, out):
    out[f"{prefix}.weight"] = np.transpose(_t(tree["kernel"]), (2, 1, 0))
    if "bias" in tree:
        out[f"{prefix}.bias"] = _t(tree["bias"])


def _bn(params, stats, prefix, out):
    out[f"{prefix}.weight"] = _t(params["scale"])
    out[f"{prefix}.bias"] = _t(params["bias"])
    out[f"{prefix}.running_mean"] = _t(stats["mean"])
    out[f"{prefix}.running_var"] = _t(stats["var"])
    out[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def _mdtc_block(params, stats, prefix, out):
    _conv1d(params["conv1"]["dw_conv"], f"{prefix}.conv1.conv", out)
    _bn(params["conv1"]["bn"], stats["conv1"]["bn"],
        f"{prefix}.conv1.bn", out)
    _conv1d(params["conv1"]["pw_conv"], f"{prefix}.conv1.pointwise", out)
    _bn(params["bn1"], stats["bn1"], f"{prefix}.bn1", out)
    _conv1d(params["conv2"], f"{prefix}.conv2", out)
    _bn(params["bn2"], stats["bn2"], f"{prefix}.bn2", out)


def export_torch_state_dict(
    params: dict,
    batch_stats: Optional[dict],
    model_conf: dict,
    cmvn: Optional[Tuple[np.ndarray, np.ndarray]] = None,
) -> Dict[str, np.ndarray]:
    """(params, batch_stats, model config) -> reference state_dict of
    numpy arrays (pass through torch.save after torch.from_numpy, or
    let bin/export_torch.py do it)."""
    stats = batch_stats or {}
    out: Dict[str, np.ndarray] = {}

    if cmvn is not None:
        out["global_cmvn.mean"] = _t(cmvn[0])
        out["global_cmvn.istd"] = _t(cmvn[1])

    prep = model_conf.get("preprocessing", {}).get("type", "none")
    if prep == "linear":
        _linear(params["preprocessing"]["proj"], "preprocessing.out.0", out)
    elif prep == "cnn1d_s1":
        _conv1d(params["preprocessing"]["conv"], "preprocessing.out.0", out)
        _bn(params["preprocessing"]["bn"],
            stats["preprocessing"]["bn"], "preprocessing.out.1", out)

    bconf = model_conf["backbone"]
    btype = bconf["type"]
    bp = params["backbone"]
    bs = stats.get("backbone", {})
    if btype == "mdtc":
        _mdtc_block(bp["preprocessor"], bs["preprocessor"],
                    "backbone.preprocessor", out)
        for si in range(bconf["num_stack"]):
            for bi in range(bconf["stack_size"]):
                name = f"stack_{si}_block_{bi}"
                _mdtc_block(bp[name], bs[name],
                            f"backbone.blocks.{si}.res_blocks.{bi}", out)
    elif btype == "tcn":
        ds = bconf.get("ds", False)
        for i in range(bconf["num_layers"]):
            blk, sblk = bp[f"block_{i}"], bs[f"block_{i}"]
            pre = f"backbone.network.{i}.cnn"
            if ds:
                _conv1d(blk["dw_conv"], f"{pre}.0", out)
                _bn(blk["dw_bn"], sblk["dw_bn"], f"{pre}.1", out)
                _conv1d(blk["pw_conv"], f"{pre}.3", out)
                _bn(blk["pw_bn"], sblk["pw_bn"], f"{pre}.4", out)
            else:
                _conv1d(blk["conv"], f"{pre}.0", out)
                _bn(blk["bn"], sblk["bn"], f"{pre}.1", out)
    elif btype == "fsmn":
        for ours, theirs in (
            ("in_linear1", "backbone.in_linear1.linear"),
            ("in_linear2", "backbone.in_linear2.linear"),
            ("out_linear1", "backbone.out_linear1.linear"),
            ("out_linear2", "backbone.out_linear2.linear"),
        ):
            _linear(bp[ours], theirs, out)
        for i in range(bconf["num_layers"]):
            _linear(bp[f"layer_{i}_proj"],
                    f"backbone.fsmn.{i}.0.linear", out, bias=False)
            fb = bp[f"layer_{i}_fsmn"]
            # (order, 1, C) -> Conv2d (C, 1, order, 1)
            wl = np.transpose(_t(fb["conv_left"]["kernel"]), (2, 1, 0))
            out[f"backbone.fsmn.{i}.1.conv_left.weight"] = wl[..., None]
            if "conv_right" in fb:
                wr = np.transpose(_t(fb["conv_right"]["kernel"]), (2, 1, 0))
                out[f"backbone.fsmn.{i}.1.conv_right.weight"] = wr[..., None]
            _linear(bp[f"layer_{i}_affine"],
                    f"backbone.fsmn.{i}.2.linear", out)
    elif btype == "gru":
        for k in range(bconf["num_layers"]):
            layer = bp[f"layer_{k}"]
            out[f"backbone.weight_ih_l{k}"] = _t(layer["ih"]["kernel"]).T
            out[f"backbone.bias_ih_l{k}"] = _t(layer["ih"]["bias"])
            out[f"backbone.weight_hh_l{k}"] = _t(layer["hh_kernel"]).T
            out[f"backbone.bias_hh_l{k}"] = _t(layer["hh_bias"])
    else:
        raise ValueError(f"unknown backbone type {btype}")

    cls = params.get("classifier", {})
    if "linear" in cls:
        _linear(cls["linear"], "classifier.linear", out)
    elif "mlp" in cls:
        _linear(cls["mlp"]["fc1"], "classifier.classifier.0", out)
        _linear(cls["mlp"]["fc2"], "classifier.classifier.3", out)

    return out


def export_torch_file(checkpoint_path: str, model_conf: dict,
                      output_path: str) -> None:
    """Our .ckpt -> reference-loadable .pt."""
    import torch

    from wekws_tpu.train.checkpoint import load_checkpoint

    params, batch_stats = load_checkpoint(checkpoint_path)
    cmvn = None
    if model_conf.get("cmvn", {}).get("mean") is not None:
        cm = model_conf["cmvn"]
        cmvn = (np.asarray(cm["mean"]), np.asarray(cm["istd"]))
    sd = export_torch_state_dict(params, batch_stats, model_conf, cmvn)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, output_path)
