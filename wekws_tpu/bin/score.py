"""Posterior-trajectory scoring CLI (max-pooling path).

Equivalent of /root/reference/wekws/bin/score.py:71-140.
"""

import argparse


def get_args():
    parser = argparse.ArgumentParser(description="compute posterior scores")
    parser.add_argument("--config", required=True)
    parser.add_argument("--test_data", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--score_file", required=True)
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--dict", dest="dict_dir", default=None,
                        help="dict dir for keyword display names")
    return parser.parse_args()


def main():
    args = get_args()
    from wekws_tpu.bin.common import load_test_setup, make_forward_fn
    from wekws_tpu.data import init_dataset
    from wekws_tpu.eval import write_score_file

    configs, model, variables, pipeline, test_conf = load_test_setup(
        args.config, args.checkpoint, args.batch_size
    )
    dataset = init_dataset(
        args.test_data, test_conf, split="test", rank=0, world_size=1
    )
    num_keywords = configs["model"]["output_dim"]
    if args.dict_dir is not None:
        from wekws_tpu.text import read_token

        import os

        table = read_token(os.path.join(args.dict_dir, "dict.txt"))
        inv = {v: k for k, v in table.items()}
        names = [inv.get(i, str(i)) for i in range(num_keywords)]
    else:
        names = [str(i) for i in range(num_keywords)]
    forward = make_forward_fn(model, variables, pipeline)
    n = write_score_file(forward, dataset, names, args.score_file)
    print(f"scored {n} utterances -> {args.score_file}")


if __name__ == "__main__":
    main()
