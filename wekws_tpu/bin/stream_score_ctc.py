"""Streaming-simulation CTC scoring CLI.

Equivalent of /root/reference/wekws/bin/stream_score_ctc.py:129-381:
runs the full test set through the frame-synchronous streaming engine
(per-utterance state reset) and writes detected/rejected score lines
for compute_det_ctc.
"""

import argparse
import json
import logging


def get_args():
    parser = argparse.ArgumentParser(description="streaming ctc scoring")
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--test_data", required=True)
    parser.add_argument("--token_file", required=True)
    parser.add_argument("--lexicon_file", default=None)
    parser.add_argument("--keywords", required=True)
    parser.add_argument("--score_file", required=True)
    parser.add_argument("--threshold", type=float, default=0.0)
    parser.add_argument("--min_frames", type=int, default=5)
    parser.add_argument("--max_frames", type=int, default=250)
    parser.add_argument("--interval_frames", type=int, default=50)
    parser.add_argument("--chunk_ms", type=int, default=300)
    return parser.parse_args()


def main():
    args = get_args()
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s"
    )
    import numpy as np

    from wekws_tpu.data.audio import read_wav
    from wekws_tpu.runtime import KeyWordSpotter

    spotter = KeyWordSpotter(
        args.checkpoint, args.config, args.token_file, args.lexicon_file,
        args.threshold, args.min_frames, args.max_frames,
        args.interval_frames,
    )
    spotter.set_keywords(args.keywords)

    with open(args.test_data, encoding="utf8") as fin, open(
        args.score_file, "w", encoding="utf8"
    ) as fout:
        for line in fin:
            if not line.strip():
                continue
            obj = json.loads(line)
            key = obj["key"]
            spotter.reset_all()
            wave, sr = read_wav(obj["wav"])
            pcm = (np.clip(wave, -1, 1) * 32767).astype("<i2").tobytes()
            chunk_bytes = 2 * int(sr * args.chunk_ms / 1000)
            hit = None
            for off in range(0, len(pcm), chunk_bytes):
                result = spotter.forward(pcm[off : off + chunk_bytes])
                if result and result.get("state") == 1:
                    hit = result
                    break
            if hit is not None:
                fout.write(
                    f"{key} detected {hit['keyword']} {hit['score']:.3f}\n"
                )
            else:
                fout.write(f"{key} rejected\n")


if __name__ == "__main__":
    main()
