"""Checkpoint-averaging CLI.

Equivalent of /root/reference/wekws/bin/average_model.py:39-85.
"""

import argparse

from wekws_tpu.train import average_checkpoints


def main():
    parser = argparse.ArgumentParser(description="average model")
    parser.add_argument("--dst_model", required=True)
    parser.add_argument("--src_path", required=True)
    parser.add_argument("--num", default=5, type=int)
    parser.add_argument("--val_best", action="store_true")
    args = parser.parse_args()
    picked = average_checkpoints(
        args.src_path, args.dst_model, args.num, args.val_best
    )
    print(f"averaged {len(picked)} checkpoints -> {args.dst_model}")
    for p in picked:
        print(f"  {p}")


if __name__ == "__main__":
    main()
