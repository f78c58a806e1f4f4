"""Post-training int8 quantization CLI.

Analog of /root/reference/wekws/bin/static_quantize.py:57-130 over the
graph-artifact path: quantize an exported model directory to int8 and
report the max posterior deviation on random probe audio.
"""

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="static quantization")
    parser.add_argument("--model_dir", required=True,
                        help="exported graph artifact dir")
    parser.add_argument("--output_dir", required=True)
    args = parser.parse_args()

    from wekws_tpu.export import GraphRuntime
    from wekws_tpu.export.quantize import quantize_artifact

    quantize_artifact(args.model_dir, args.output_dir)

    f32 = GraphRuntime(args.model_dir)
    q = GraphRuntime(args.output_dir)
    rng = np.random.default_rng(0)
    in_dim = None
    for entry in f32.ops:
        if entry["op"] in ("dense", "conv", "dw_conv", "cmvn"):
            key = "W" if "W" in entry else "mean"
            in_dim = f32.tensor(entry[key]).shape[0]
            break
    probe = rng.standard_normal((200, in_dim)).astype(np.float32)
    a, _ = f32.forward(probe)
    b, _ = q.forward(probe)
    err = float(np.abs(a - b).max())
    print(f"quantized -> {args.output_dir}; max deviation {err:.4f}")


if __name__ == "__main__":
    main()
