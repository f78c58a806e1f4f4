"""Post-training int8 quantization CLI.

Analog of /root/reference/wekws/bin/static_quantize.py:57-130 over the
graph-artifact path.  With ``--calib_data`` (a data.list) it performs
REAL static quantization: activation ranges are observed over the
calibration set and the artifact executes dense/conv ops in int8 in
both runtimes.  Without it, weights-only quantization (storage
shrink, float compute) is applied.
"""

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="static quantization")
    parser.add_argument("--model_dir", required=True,
                        help="exported graph artifact dir")
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--calib_data", default=None,
                        help="data.list for activation calibration "
                             "(reference uses the test set)")
    parser.add_argument("--num_calib", type=int, default=100,
                        help="max calibration utterances")
    parser.add_argument("--percentile", type=float, default=None,
                        help="range percentile (default: min/max)")
    args = parser.parse_args()

    from wekws_tpu.export import GraphRuntime
    from wekws_tpu.export.quantize import quantize_artifact

    calib_feats = None
    if args.calib_data:
        import json

        from wekws_tpu.data.audio import read_wav
        from wekws_tpu.export.calibrate import feats_from_waves

        waves = []
        failed = 0
        with open(args.calib_data, encoding="utf8") as f:
            for line in f:
                if len(waves) >= args.num_calib:
                    break
                obj = json.loads(line)
                try:
                    wave, _sr = read_wav(obj["wav"])
                except Exception as e:
                    failed += 1
                    if failed <= 5:
                        print(f"warning: cannot read {obj.get('wav')}: {e}")
                    continue
                waves.append(wave * 32768.0)
        if failed:
            print(f"warning: {failed} calibration wavs unreadable")
        if not waves:
            raise SystemExit(
                f"no readable calibration audio in {args.calib_data} "
                f"({failed} failures) — check the wav paths"
            )
        calib_feats = feats_from_waves(args.model_dir, waves)
        print(f"calibrated over {len(calib_feats)} utterances")

    quantize_artifact(args.model_dir, args.output_dir,
                      calib_feats=calib_feats,
                      percentile=args.percentile)

    f32 = GraphRuntime(args.model_dir)
    q = GraphRuntime(args.output_dir)
    rng = np.random.default_rng(0)
    in_dim = None
    for entry in f32.ops:
        if entry["op"] in ("dense", "conv", "dw_conv", "cmvn"):
            key = "W" if "W" in entry else "mean"
            in_dim = f32.tensor(entry[key]).shape[0]
            break
    if calib_feats:
        probes = calib_feats[: min(10, len(calib_feats))]
    else:
        probes = [rng.standard_normal((200, in_dim)).astype(np.float32)]
    err = 0.0
    for probe in probes:
        a, _ = f32.forward(probe)
        b, _ = q.forward(probe)
        err = max(err, float(np.abs(a - b).max()))
    mode = "static int8 execution" if calib_feats else "weights-only"
    print(f"quantized ({mode}) -> {args.output_dir}; "
          f"max posterior deviation {err:.4f}")


if __name__ == "__main__":
    main()
