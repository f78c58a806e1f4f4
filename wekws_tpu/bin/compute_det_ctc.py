"""DET curve CLI (CTC path).

Equivalent of /root/reference/wekws/bin/compute_det_ctc.py:164-287.
"""

import argparse
import os


def main():
    parser = argparse.ArgumentParser(description="compute ctc det curve")
    parser.add_argument("--test_data", required=True)
    parser.add_argument("--keywords", required=True,
                        help="comma separated keywords")
    parser.add_argument("--score_file", required=True)
    parser.add_argument("--step", type=float, default=0.001)
    parser.add_argument("--stats_dir", default=None)
    parser.add_argument("--figure_file", default=None,
                        help="write an overlaid DET plot (legend labels "
                             "romanized via pypinyin when installed)")
    args = parser.parse_args()

    from wekws_tpu.eval.det_ctc import (
        compute_det_ctc,
        load_label_and_score_ctc,
        space_mixed_label,
    )
    from wekws_tpu.eval.det import write_stats_file

    keywords = [k for k in args.keywords.strip().replace(" ", "").split(",")
                if k]
    table = load_label_and_score_ctc(
        keywords, args.test_data, args.score_file
    )
    stats_dir = args.stats_dir or os.path.dirname(args.score_file)
    for keyword in keywords:
        norm_kw = space_mixed_label(keyword)
        entry = table[norm_kw]
        print(
            f"{keyword}: {len(entry['keyword_table'])} keyword utts "
            f"({entry['keyword_duration'] / 3600.0:.3f} h), filler "
            f"{entry['filler_duration'] / 3600.0:.3f} h"
        )
        results = compute_det_ctc(entry, step=args.step)
        stats_file = os.path.join(
            stats_dir, "stats." + norm_kw.replace(" ", "_") + ".txt"
        )
        write_stats_file(results, stats_file)

    if args.figure_file:
        from wekws_tpu.eval.det_ctc import plot_det_curves

        plot_det_curves(stats_dir, args.figure_file)


if __name__ == "__main__":
    main()
