"""End-to-end CLI recipe test: the staged run.sh flow in miniature.

Builds a synthetic wake-word corpus, then drives the real CLIs via
subprocess: train -> average_model -> score -> compute_det ->
export_model (with parity gate) -> compute_accuracy, validating the
whole user-facing surface.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(module, *args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    result = subprocess.run(
        [sys.executable, "-m", module, *args],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert result.returncode == 0, (
        f"{module} failed:\nstdout:{result.stdout}\nstderr:{result.stderr}"
    )
    return result


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    from wekws_tpu.data.audio import write_wav
    from wekws_tpu.tools import compute_cmvn_stats

    tmp = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(0)
    dataset_conf = {
        "filter_conf": {"max_length": 2048, "min_length": 0},
        "resample_conf": {"resample_rate": 16000},
        "feats_type": "fbank",
        "fbank_conf": {"num_mel_bins": 23, "frame_shift": 10,
                       "frame_length": 25, "dither": 0.0},
        "shuffle": True,
        "shuffle_conf": {"shuffle_size": 32},
        "batch_conf": {"batch_size": 8, "bucket_samples": 8000},
    }
    config = {
        "dataset_conf": dataset_conf,
        "model": {
            "hidden_dim": 16,
            "preprocessing": {"type": "linear"},
            "backbone": {"type": "tcn", "ds": True, "num_layers": 2,
                         "kernel_size": 4, "dropout": 0.0},
        },
        "optim_conf": {"lr": 3e-3},
        "training_config": {"grad_clip": 5, "max_epoch": 2,
                            "log_interval": 5},
    }

    paths = []
    for split, n in [("train", 24), ("dev", 8), ("test", 8)]:
        lines = []
        for i in range(n):
            is_kw = i % 2 == 0
            freq = 500 if is_kw else 1200
            t = np.arange(8000) / 16000
            wave = (0.3 * np.sin(2 * np.pi * freq * t)
                    + 0.02 * rng.standard_normal(8000)).astype(np.float32)
            p = tmp / f"{split}_{i}.wav"
            write_wav(str(p), wave, 16000)
            if split == "train":
                paths.append(str(p))
            lines.append(json.dumps({
                "key": f"{split}_{i}",
                "txt": "<kw>" if is_kw else "other",
                "wav": str(p),
                "duration": 0.5,
            }))
        (tmp / f"{split}.list").write_text("\n".join(lines) + "\n")
        # train CLI expects integer labels for max_pooling
        int_lines = []
        for line in lines:
            obj = json.loads(line)
            obj["txt"] = "0" if obj["txt"] == "<kw>" else "-1"
            int_lines.append(json.dumps(obj))
        (tmp / f"{split}_int.list").write_text("\n".join(int_lines) + "\n")

    cmvn = tmp / "global_cmvn"
    compute_cmvn_stats(paths, dataset_conf, str(cmvn))
    (tmp / "config.yaml").write_text(yaml.dump(config))
    return tmp


def test_full_cli_flow(workspace):
    tmp = workspace
    model_dir = tmp / "exp"

    run_cli(
        "wekws_tpu.bin.train",
        "--config", str(tmp / "config.yaml"),
        "--train_data", str(tmp / "train_int.list"),
        "--cv_data", str(tmp / "dev_int.list"),
        "--model_dir", str(model_dir),
        "--num_keywords", "1",
        "--min_duration", "5",
        "--cmvn_file", str(tmp / "global_cmvn"),
        "--norm_var",
    )
    assert (model_dir / "config.yaml").exists()
    assert (model_dir / "final.ckpt").exists()
    assert (model_dir / "1.yaml").exists()
    assert (model_dir / "metrics.jsonl").exists()

    avg = model_dir / "avg_2.ckpt"
    run_cli(
        "wekws_tpu.bin.average_model",
        "--dst_model", str(avg), "--src_path", str(model_dir),
        "--num", "2", "--val_best",
    )
    assert avg.exists()

    score_file = tmp / "score.txt"
    run_cli(
        "wekws_tpu.bin.score",
        "--config", str(model_dir / "config.yaml"),
        "--test_data", str(tmp / "test_int.list"),
        "--checkpoint", str(avg),
        "--score_file", str(score_file),
    )
    lines = score_file.read_text().splitlines()
    assert len(lines) == 8  # 8 utts x 1 keyword

    stats_file = tmp / "stats.0.txt"
    run_cli(
        "wekws_tpu.bin.compute_det",
        "--keyword", "0",
        "--test_data", str(tmp / "test_int.list"),
        "--score_file", str(score_file),
        "--stats_file", str(stats_file),
        "--window_shift", "10",
    )
    rows = [ln.split() for ln in stats_file.read_text().splitlines()]
    assert len(rows) > 90
    # trained model separates tones: some threshold with low FRR
    frrs = [float(r[2]) for r in rows]
    assert min(frrs) <= 0.25

    export_dir = tmp / "export"
    run_cli(
        "wekws_tpu.bin.export_model",
        "--config", str(model_dir / "config.yaml"),
        "--checkpoint", str(avg),
        "--output_dir", str(export_dir),
    )
    assert (export_dir / "model.txt").exists()
    assert (export_dir / "weights.bin").exists()

    quant_dir = tmp / "quant"
    run_cli(
        "wekws_tpu.bin.static_quantize",
        "--model_dir", str(export_dir),
        "--output_dir", str(quant_dir),
    )
    assert (quant_dir / "weights_int8.bin").exists()


def test_train_cli_with_bucketed_batching(workspace):
    """The train CLI runs with batch_conf.bucket_boundaries (the
    multi-host lockstep shape policy) on a single process — scheduled
    shapes, duplicate fill, valid-masked criterion all engaged."""
    conf = yaml.safe_load((workspace / "config.yaml").read_text())
    conf["dataset_conf"]["batch_conf"] = {
        "batch_size": 8,
        "bucket_boundaries": [8000, 16000],
    }
    conf["training_config"]["max_epoch"] = 1
    bucket_cfg = workspace / "config_bucket.yaml"
    bucket_cfg.write_text(yaml.dump(conf))
    model_dir = workspace / "exp_bucket"
    run_cli(
        "wekws_tpu.bin.train",
        "--config", str(bucket_cfg),
        "--train_data", str(workspace / "train_int.list"),
        "--cv_data", str(workspace / "dev_int.list"),
        "--model_dir", str(model_dir),
        "--num_keywords", "1",
        "--min_duration", "5",
    )
    assert (model_dir / "0.ckpt").exists()
    sidecar = yaml.safe_load((model_dir / "0.yaml").read_text())
    assert np.isfinite(sidecar["cv_loss"])


def test_batch_stream_kws_cli(workspace):
    """Batched multi-stream serving CLI: N wavs through one batched
    cached forward, aggregate-RTF summary printed."""
    import jax

    from wekws_tpu.models import init_model
    from wekws_tpu.train import save_checkpoint

    tmp = workspace
    configs = {
        "dataset_conf": {
            "feats_type": "fbank",
            "fbank_conf": {"num_mel_bins": 23, "frame_shift": 10,
                           "frame_length": 25, "dither": 0.0},
        },
        "model": {
            "input_dim": 23, "output_dim": 4, "hidden_dim": 16,
            "preprocessing": {"type": "linear"},
            "backbone": {"type": "tcn", "ds": True, "num_layers": 2,
                         "kernel_size": 4, "dropout": 0.0},
            "classifier": {"type": "element", "dropout": 0.0},
            "activation": {"type": "identity"},
        },
    }
    config_path = tmp / "ctc_config.yaml"
    config_path.write_text(yaml.dump(configs))
    model = init_model(configs["model"])
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 10, 23), np.float32)
    )
    ckpt = tmp / "ctc.ckpt"
    save_checkpoint(
        str(ckpt), variables["params"], variables.get("batch_stats", {})
    )
    tokens = tmp / "ctc_tokens.txt"
    tokens.write_text("<blk> 0\nh 1\ni 2\nx 3\n")

    result = run_cli(
        "wekws_tpu.bin.batch_stream_kws",
        "--config", str(config_path),
        "--checkpoint", str(ckpt),
        "--token_file", str(tokens),
        "--keywords", "hi",
        "--wav_paths", str(tmp / "test_0.wav"), str(tmp / "test_1.wav"),
        "--streams", "3",
        "--threshold", "0.5",
    )
    assert "served 3 streams" in result.stdout
    assert "x realtime" in result.stdout


def test_train_cli_device_resident_with_aug(workspace, tmp_path):
    """--device_resident with waveform-aug conf keys: the CLI stages
    the corpus AND the noise/RIR banks and trains with the aug chain
    inside the jitted step (data/device_aug.py)."""
    import numpy as np

    from wekws_tpu.data.blobstore import BlobWriter
    from wekws_tpu.data.audio import write_wav

    tmp = workspace
    rng = np.random.default_rng(3)

    def wav_bytes(wave):
        import io
        import struct

        pcm = np.clip(wave * 32768.0, -32768, 32767).astype("<i2")
        data = pcm.tobytes()
        buf = io.BytesIO()
        buf.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        buf.write(b"fmt " + struct.pack(
            "<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16))
        buf.write(b"data" + struct.pack("<I", len(data)) + data)
        return buf.getvalue()

    with BlobWriter(str(tmp_path / "noise_store")) as w:
        for i in range(3):
            w.put(f"noise_{i}",
                  wav_bytes(rng.standard_normal(6000) * 0.01))
    with BlobWriter(str(tmp_path / "rir_store")) as w:
        rir = rng.standard_normal(200) * np.exp(
            -np.arange(200) / 40.0)
        w.put("rir_0", wav_bytes(rir * 0.1))

    config = yaml.safe_load((tmp / "config.yaml").read_text())
    config["dataset_conf"].update({
        "speed_perturb": True,
        "noise_prob": 0.6,
        "noise_source": str(tmp_path / "noise_store"),
        "reverb_prob": 0.4,
        "reverb_source": str(tmp_path / "rir_store"),
    })
    config["training_config"]["max_epoch"] = 1
    cfg = tmp_path / "config_aug.yaml"
    cfg.write_text(yaml.dump(config))

    model_dir = tmp_path / "exp_aug"
    run_cli(
        "wekws_tpu.bin.train",
        "--config", str(cfg),
        "--train_data", str(tmp / "train_int.list"),
        "--cv_data", str(tmp / "dev_int.list"),
        "--model_dir", str(model_dir),
        "--num_keywords", "1",
        "--min_duration", "5",
        "--device_resident",
    )
    assert (model_dir / "final.ckpt").exists()
    metrics = [json.loads(x) for x in
               (model_dir / "metrics.jsonl").read_text().splitlines()]
    assert any(np.isfinite(m.get("train_loss", np.nan))
               for m in metrics)
