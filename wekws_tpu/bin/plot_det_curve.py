"""DET curve plotting CLI.

Equivalent of /root/reference/wekws/bin/plot_det_curve.py:33-53:
FA/h (x) vs FRR% (y) curves from per-keyword stats files.
"""

import argparse
import os


def plot_det_curve(
    keywords, stats_dir, figure_file, xlim=5, x_step=1, ylim=35, y_step=5
):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    plt.figure(dpi=200)
    plt.rcParams["font.size"] = 12

    for keyword in keywords:
        stats_file = os.path.join(stats_dir, "stats." + keyword + ".txt")
        values = []
        with open(stats_file, "r", encoding="utf8") as fin:
            for line in fin:
                arr = line.strip().split()
                values.append([float(arr[1]), float(arr[2]) * 100])
        values = np.array(values)
        values = values[np.argsort(values[:, 0])]
        plt.plot(values[:, 0], values[:, 1], label=keyword)

    plt.xlim([0, xlim])
    plt.ylim([0, ylim])
    plt.xticks(range(0, xlim + x_step, x_step))
    plt.yticks(range(0, ylim + y_step, y_step))
    plt.xlabel("False Alarm Per Hour")
    plt.ylabel("False Rejection Rate (%)")
    plt.grid(linestyle="--")
    plt.legend(loc="best", fontsize=16)
    plt.savefig(figure_file)


def main():
    parser = argparse.ArgumentParser(description="plot det curve")
    parser.add_argument("--keywords_dict", required=True,
                        help="words.txt; first line skipped like the "
                             "reference recipes")
    parser.add_argument("--stats_dir", required=True)
    parser.add_argument("--figure_file", required=True)
    parser.add_argument("--xlim", type=int, default=5)
    parser.add_argument("--x_step", type=int, default=1)
    parser.add_argument("--ylim", type=int, default=35)
    parser.add_argument("--y_step", type=int, default=5)
    args = parser.parse_args()

    with open(args.keywords_dict, encoding="utf8") as f:
        keywords = [line.strip().split()[0] for line in f if line.strip()][1:]
    plot_det_curve(
        keywords, args.stats_dir, args.figure_file,
        args.xlim, args.x_step, args.ylim, args.y_step,
    )


if __name__ == "__main__":
    main()
