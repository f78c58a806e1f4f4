"""Convert a reference (wenet-e2e/wekws) PyTorch checkpoint into this
framework's checkpoint format.

Usage:
    python -m wekws_tpu.bin.import_torch \
        --torch_checkpoint avg_30.pt \
        --config config.yaml \
        --output_checkpoint exp/imported.ckpt

The config is the (reference-compatible) training config whose
``model`` section describes the checkpoint's architecture.  If the
checkpoint embeds GlobalCMVN buffers they are written next to the
output as ``<output>.cmvn.json`` with inline ``{mean, istd}`` stats
(wire them via the model config's ``cmvn`` entry, or keep using the
original cmvn file).  The converted checkpoint then flows through the
normal paths: score/DET, export_model, static_quantize, C++ runtime.
"""

import argparse
import json

import yaml


def main():
    parser = argparse.ArgumentParser(
        description="import a reference torch checkpoint"
    )
    parser.add_argument("--torch_checkpoint", required=True)
    parser.add_argument("--config", required=True,
                        help="training config (model section)")
    parser.add_argument("--output_checkpoint", required=True)
    args = parser.parse_args()

    from wekws_tpu.tools.import_torch import import_torch_file
    from wekws_tpu.train import save_checkpoint

    with open(args.config) as f:
        configs = yaml.safe_load(f)
    params, stats, cmvn = import_torch_file(
        args.torch_checkpoint, configs["model"]
    )
    save_checkpoint(args.output_checkpoint, params, stats)
    msg = f"imported -> {args.output_checkpoint}"
    if cmvn is not None:
        cmvn_path = args.output_checkpoint + ".cmvn.json"
        with open(cmvn_path, "w") as f:
            json.dump({"mean": cmvn[0].tolist(),
                       "istd": cmvn[1].tolist()}, f)
        msg += f" (+ {cmvn_path})"
    print(msg)


if __name__ == "__main__":
    main()
