"""Convergence gates for perf knobs: train the synthetic recipe with a
knob flipped and compare the cv_loss trajectory against baseline
epoch-for-epoch (the harness that promoted bf16 conv in round 2).

Usage: python tools/gate_knobs.py [variant ...]
Variants: baseline dither_wave frontend_default ghost_bn8 bf16 bf16_bn
Runs from examples/synthetic's corpus (generates it if missing).
"""

import copy
import os
import subprocess
import sys

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RECIPE = os.path.join(REPO, "examples", "synthetic")

VARIANTS = {
    "baseline": lambda c: c,
}


def _dither_wave(c):
    c["dataset_conf"]["fbank_conf"]["dither_mode"] = "wave"
    return c


def _frontend_default(c):
    c["dataset_conf"]["fbank_conf"]["precision"] = "default"
    return c


def _ghost_bn8(c):
    c["model"]["backbone"]["ghost_bn"] = 8
    return c


def _bf16(c):
    c["model"]["dtype"] = "bfloat16"
    return c


def _bf16_bn(c):
    c["model"]["dtype"] = "bfloat16"
    c["model"]["backbone"]["bn_dtype"] = "bfloat16"
    return c


VARIANTS.update(
    dither_wave=_dither_wave,
    frontend_default=_frontend_default,
    ghost_bn8=_ghost_bn8,
    bf16=_bf16,
    bf16_bn=_bf16_bn,
)


def ensure_corpus():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    data = os.path.join(RECIPE, "data")
    if not os.path.exists(os.path.join(data, "train.list")):
        subprocess.run(
            [sys.executable, "local/gen_data.py", "data"], cwd=RECIPE,
            check=True, env=env,
        )
    if not os.path.exists(os.path.join(data, "global_cmvn")):
        subprocess.run(
            ["bash", "run.sh", "1", "1"], cwd=RECIPE, check=True, env=env,
        )


def run_variant(name, out_root):
    with open(os.path.join(RECIPE, "conf", "ds_tcn.yaml")) as f:
        conf = yaml.safe_load(f)
    conf = VARIANTS[name](copy.deepcopy(conf))
    vdir = os.path.join(out_root, name)
    os.makedirs(vdir, exist_ok=True)
    cpath = os.path.join(vdir, "conf.yaml")
    with open(cpath, "w") as f:
        yaml.dump(conf, f)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    subprocess.run(
        [sys.executable, "-m", "wekws_tpu.bin.train",
         "--config", cpath,
         "--train_data", os.path.join(RECIPE, "data", "train.list"),
         "--cv_data", os.path.join(RECIPE, "data", "dev.list"),
         "--model_dir", vdir,
         "--num_keywords", "1", "--min_duration", "20",
         "--seed", "666",
         "--cmvn_file", os.path.join(RECIPE, "data", "global_cmvn"),
         "--norm_var"],
        check=True, env=env, cwd=REPO,
    )
    # cv_loss lives in the per-epoch checkpoint sidecars
    losses = []
    e = 0
    while os.path.exists(os.path.join(vdir, f"{e}.yaml")):
        with open(os.path.join(vdir, f"{e}.yaml")) as f:
            losses.append(float(yaml.safe_load(f)["cv_loss"]))
        e += 1
    return losses


def main():
    names = sys.argv[1:] or list(VARIANTS)
    ensure_corpus()
    out_root = os.path.join(REPO, "examples", "synthetic", "exp", "gates")
    results = {}
    for name in names:
        print(f"=== {name} ===", flush=True)
        results[name] = run_variant(name, out_root)
    epochs = max(len(v) for v in results.values())
    header = "epoch " + " ".join(f"{n:>18s}" for n in results)
    print(header)
    for e in range(epochs):
        row = f"{e:5d} "
        for n in results:
            v = results[n][e] if e < len(results[n]) else float("nan")
            row += f" {v:18.4f}"
        print(row)


if __name__ == "__main__":
    main()
