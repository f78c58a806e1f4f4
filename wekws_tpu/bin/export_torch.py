"""Export a checkpoint as a reference (wenet-e2e/wekws) PyTorch .pt.

The inverse of bin/import_torch.py: models trained in this framework
load directly into the reference's score/export_onnx/runtime tooling
(torch.load + load_state_dict on its init_model(configs)).

Usage:
    python -m wekws_tpu.bin.export_torch \
        --checkpoint exp/avg_5.ckpt --config exp/config.yaml \
        --output exp/avg_5_torch.pt
"""

import argparse

import yaml


def main():
    parser = argparse.ArgumentParser(
        description="export a checkpoint as a reference torch .pt"
    )
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--config", required=True,
                        help="resolved training config (model section)")
    parser.add_argument("--output", required=True)
    args = parser.parse_args()

    from wekws_tpu.tools.export_torch import export_torch_file

    with open(args.config) as f:
        configs = yaml.safe_load(f)
    export_torch_file(args.checkpoint, configs["model"], args.output)
    print(f"exported -> {args.output}")


if __name__ == "__main__":
    main()
