"""Utterance classification accuracy CLI (speech-commands path).

Equivalent of /root/reference/wekws/bin/compute_accuracy.py:61-102,
but on the unified data path (the reference's version still consumes
its drifted legacy dataset — SURVEY.md §2.2 note).
"""

import argparse


def main():
    parser = argparse.ArgumentParser(description="compute accuracy")
    parser.add_argument("--config", required=True)
    parser.add_argument("--test_data", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--batch_size", type=int, default=256)
    args = parser.parse_args()

    from wekws_tpu.bin.common import load_test_setup, make_forward_fn
    from wekws_tpu.data import init_dataset
    from wekws_tpu.eval.accuracy import accuracy_over_dataset

    configs, model, variables, pipeline, test_conf = load_test_setup(
        args.config, args.checkpoint, args.batch_size
    )
    dataset = init_dataset(
        args.test_data, test_conf, split="test", rank=0, world_size=1
    )
    forward = make_forward_fn(model, variables, pipeline)
    correct, total = accuracy_over_dataset(forward, dataset)
    acc = correct / max(total, 1)
    print(f"Accuracy: {acc:.6f} ({correct}/{total})")


if __name__ == "__main__":
    main()
