"""CTC keyword scoring CLI.

Equivalent of /root/reference/wekws/bin/score_ctc.py:106-237.
"""

import argparse
import os


def get_args():
    parser = argparse.ArgumentParser(description="ctc keyword scoring")
    parser.add_argument("--config", required=True)
    parser.add_argument("--test_data", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--score_file", required=True)
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--dict", dest="dict_dir", required=True)
    parser.add_argument("--keywords", required=True,
                        help="comma separated keywords")
    parser.add_argument("--score_beam_size", type=int, default=3)
    parser.add_argument("--path_beam_size", type=int, default=20)
    parser.add_argument("--device_decode", action="store_true",
                        help="batched on-device prefix beam search")
    return parser.parse_args()


def main():
    args = get_args()
    from wekws_tpu.bin.common import load_test_setup, make_forward_fn
    from wekws_tpu.data import init_dataset
    from wekws_tpu.eval.score_ctc import (
        build_keywords_token,
        write_ctc_score_file,
    )
    from wekws_tpu.text import CharTokenizer

    words = os.path.join(args.dict_dir, "words.txt")
    tokenizer = CharTokenizer(
        os.path.join(args.dict_dir, "dict.txt"),
        words if os.path.exists(words) else None,
        unk="<filler>",
        split_with_space=True,
    )
    keywords = [k for k in args.keywords.strip().replace(" ", "").split(",")
                if k]
    keywords_token, idxset = build_keywords_token(keywords, tokenizer)

    configs, model, variables, pipeline, test_conf = load_test_setup(
        args.config, args.checkpoint, args.batch_size
    )
    dataset = init_dataset(
        args.test_data, test_conf, tokenizer, split="test",
        rank=0, world_size=1,
    )
    forward = make_forward_fn(model, variables, pipeline, softmax=True)
    n = write_ctc_score_file(
        forward, dataset, keywords_token, idxset, args.score_file,
        args.score_beam_size, args.path_beam_size,
        device_decode=args.device_decode,
    )
    print(f"scored {n} utterances -> {args.score_file}")


if __name__ == "__main__":
    main()
