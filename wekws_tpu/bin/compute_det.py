"""DET curve CLI (max-pooling path).

Equivalent of /root/reference/wekws/bin/compute_det.py:54-106.
"""

import argparse


def main():
    parser = argparse.ArgumentParser(description="compute det curve")
    parser.add_argument("--test_data", required=True, help="label file")
    parser.add_argument("--keyword", required=True, help="keyword label")
    parser.add_argument("--score_file", required=True)
    parser.add_argument("--step", type=float, default=0.01)
    parser.add_argument("--window_shift", type=int, default=50)
    parser.add_argument("--stats_file", required=True)
    args = parser.parse_args()

    from wekws_tpu.eval import (
        compute_det,
        load_label_and_score,
        write_stats_file,
    )

    keyword_table, filler_table, filler_duration = load_label_and_score(
        args.keyword, args.test_data, args.score_file
    )
    print(f"Filler total duration Hours: {filler_duration / 3600.0}")
    results = compute_det(
        keyword_table, filler_table, filler_duration,
        step=args.step, window_shift=args.window_shift,
    )
    write_stats_file(results, args.stats_file)


if __name__ == "__main__":
    main()
