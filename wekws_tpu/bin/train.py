"""Training CLI.

Equivalent of /root/reference/wekws/bin/train.py: YAML config + flags,
per-epoch checkpoints with {epoch, lr, cv_loss} sidecars, resolved
config written to <model_dir>/config.yaml for downstream scoring and
export, final.ckpt symlink.  Multi-host: every process runs this same
script (jax.distributed discovery via --coordinator/--num_processes/
--process_id or TPU auto-detection), data sharded by process.
"""

import argparse
import copy
import logging
import os
import random

import numpy as np
import yaml


def get_args():
    parser = argparse.ArgumentParser(description="training your network")
    parser.add_argument("--config", required=True, help="config file")
    parser.add_argument("--train_data", required=True, help="train data list")
    parser.add_argument("--cv_data", required=True, help="cv data list")
    parser.add_argument("--model_dir", required=True, help="save model dir")
    parser.add_argument("--checkpoint", help="checkpoint to resume from")
    parser.add_argument("--num_keywords", default=1, type=int,
                        help="number of keywords (output dim)")
    parser.add_argument("--min_duration", default=50, type=int,
                        help="min duration frames of the keyword")
    parser.add_argument("--seed", default=777, type=int, help="random seed")
    parser.add_argument("--cmvn_file", default=None, help="global cmvn file")
    parser.add_argument("--norm_var", action="store_true", default=False,
                        help="norm var option")
    parser.add_argument("--dict", dest="dict_dir", default=None,
                        help="dict dir (dict.txt [+ words.txt]) for CTC")
    parser.add_argument("--num_epochs", type=int, default=None,
                        help="override training_config.max_epoch")
    parser.add_argument("--coordinator", default=None)
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument("--profile_dir", default=None,
                        help="write a jax.profiler trace of early steps")
    parser.add_argument("--num_workers", type=int, default=0,
                        help="data-loading worker processes")
    parser.add_argument("--device_resident", action="store_true",
                        default=False,
                        help="stage the train/cv waves in device HBM "
                             "once and shuffle/batch/slice on device — "
                             "zero per-step H2D (clean corpora only; "
                             "waveform augmentation needs the "
                             "streaming host pipeline)")
    parser.add_argument("--compilation_cache_dir", default=None,
                        help="persistent XLA compilation cache: "
                             "re-launched jobs on the same topology "
                             "reload compiled train/cv steps from disk")
    return parser.parse_args()


def main():
    args = get_args()
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s"
    )
    random.seed(args.seed)
    np.random.seed(args.seed)

    from wekws_tpu.parallel.mesh import distributed_init

    distributed_init(args.coordinator, args.num_processes, args.process_id)

    if args.compilation_cache_dir:
        from wekws_tpu.bin.common import enable_compilation_cache

        enable_compilation_cache(args.compilation_cache_dir)

    import jax

    from wekws_tpu.data import init_dataset
    from wekws_tpu.data.device_pipeline import DeviceFeaturePipeline
    from wekws_tpu.models import init_model
    from wekws_tpu.parallel import make_mesh
    from wekws_tpu.text import CharTokenizer
    from wekws_tpu.train import (
        Executor,
        ReduceLROnPlateau,
        Trainer,
        load_checkpoint,
        load_checkpoint_info,
        save_checkpoint,
    )
    from wekws_tpu.train.checkpoint import link_final

    with open(args.config, "r") as fin:
        configs = yaml.safe_load(fin)

    dataset_conf = configs["dataset_conf"]
    train_conf = configs.get("training_config", {})
    criterion_type = train_conf.get("criterion", None)

    tokenizer = None
    if args.dict_dir is not None:
        words = os.path.join(args.dict_dir, "words.txt")
        tokenizer = CharTokenizer(
            os.path.join(args.dict_dir, "dict.txt"),
            words if os.path.exists(words) else None,
            unk="<filler>",
        )

    train_pipeline = DeviceFeaturePipeline.from_conf(dataset_conf, True)
    cv_pipeline = DeviceFeaturePipeline.from_conf(dataset_conf, False)

    from wekws_tpu.data.loader import DataLoader

    mesh = make_mesh()
    train_corpus = cv_corpus = None
    train_dataset = cv_dataset = None
    batch_size = dataset_conf.get("batch_conf", {}).get("batch_size", 16)
    if args.device_resident:
        # stage BEFORE any model execution: bulk H2D runs at full rate
        # on an idle device (PERF.md: tunnel H2D anomaly)
        from wekws_tpu.data.resident import stage_data_list

        wants_wave_aug = bool(
            dataset_conf.get("speed_perturb", False)
            or dataset_conf.get("noise_prob", 0) > 0
            or dataset_conf.get("reverb_prob", 0) > 0
        )
        train_corpus = stage_data_list(
            args.train_data, dataset_conf, tokenizer, split="train",
            mesh=mesh, device_aug=wants_wave_aug,
        )
        cv_corpus = stage_data_list(
            args.cv_data, dataset_conf, tokenizer, split="cv", mesh=mesh,
        )
        if wants_wave_aug:
            # waveform augmentation joins the jitted step: banks staged
            # in HBM once, speed/reverb/noise applied per gathered
            # batch (data/device_aug.py — host-pipeline math parity)
            from wekws_tpu.data.device_aug import DeviceWaveAug

            train_pipeline.wave_aug = DeviceWaveAug.from_conf(
                dataset_conf,
                max_wave_samples=int(
                    train_corpus.arrays["waves"].shape[1]),
            )
    else:
        train_dataset = DataLoader(
            init_dataset(args.train_data, dataset_conf, tokenizer,
                         split="train"),
            num_workers=args.num_workers,
        )
        cv_dataset = DataLoader(
            init_dataset(args.cv_data, dataset_conf, tokenizer, split="cv"),
            num_workers=args.num_workers,
        )

    # resolve model config (reference train.py:139-153)
    model_conf = configs["model"]
    model_conf["input_dim"] = train_pipeline.output_dim
    if criterion_type == "ctc":
        assert tokenizer is not None, "--dict required for ctc"
        model_conf["output_dim"] = tokenizer.vocab_size
    else:
        model_conf["output_dim"] = args.num_keywords
    if args.cmvn_file is not None:
        model_conf["cmvn"] = {
            # absolute: the resolved config is consumed from other cwds
            "cmvn_file": os.path.abspath(args.cmvn_file),
            "norm_var": args.norm_var,
        }
    if criterion_type is None:
        criterion_type = (
            "ce" if "classifier" in model_conf else "max_pooling"
        )
    configs["model"] = model_conf

    os.makedirs(args.model_dir, exist_ok=True)
    if jax.process_index() == 0:
        saved_config_path = os.path.join(args.model_dir, "config.yaml")
        with open(saved_config_path, "w") as fout:
            yaml.dump(configs, fout)

    model = init_model(model_conf)
    optim_conf = configs.get("optim_conf", {})
    trainer = Trainer(
        model,
        train_pipeline,
        cv_pipeline,
        criterion_type,
        learning_rate=optim_conf.get("lr", 1e-3),
        grad_clip=train_conf.get("grad_clip", 5.0),
        weight_decay=optim_conf.get("weight_decay", 0.0),
        min_duration=args.min_duration,
    )
    executor = Executor(
        trainer, mesh,
        log_interval=train_conf.get("log_interval", 10),
        profile_dir=args.profile_dir,
        metrics_path=os.path.join(args.model_dir, "metrics.jsonl")
        if jax.process_index() == 0 else None,
    )

    # TensorBoard epoch scalars (reference train.py:188,239-241);
    # dependency-free writer, alongside metrics.jsonl
    writer = None
    if jax.process_index() == 0:
        from wekws_tpu.train.tensorboard import SummaryWriter

        writer = SummaryWriter(os.path.join(args.model_dir, "tensorboard"))

    if args.device_resident:
        b0 = min(batch_size, cv_corpus.n)
        first_batch = {
            k: v[:b0] for k, v in cv_corpus.arrays.items()
        }
    else:
        first_batch = next(iter(cv_dataset))
    state = trainer.init_state(jax.random.PRNGKey(args.seed), first_batch)
    start_epoch = 0
    scheduler = ReduceLROnPlateau(optim_conf.get("lr", 1e-3))
    if args.checkpoint is not None:
        template = {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
        }
        params, stats = load_checkpoint(args.checkpoint, template)
        state = state.replace(params=params, batch_stats=stats)
        info = load_checkpoint_info(args.checkpoint)
        start_epoch = int(info.get("epoch", -1)) + 1
        if "lr" in info:
            scheduler.lr = float(info["lr"])
        if "cv_loss" in info:
            scheduler.best = float(info["cv_loss"])
        logging.info("resumed from %s at epoch %d", args.checkpoint,
                     start_epoch)
    elif jax.process_index() == 0:
        save_checkpoint(
            os.path.join(args.model_dir, "init.ckpt"),
            state.params, state.batch_stats,
        )

    max_epoch = args.num_epochs or train_conf.get("max_epoch", 100)
    # rbg keys: the per-step dither/spec_aug/dropout draws are ~40M
    # samples at B=512; threefry spends ~1 ms/step generating them on
    # v5e, rbg ~0.55 ms (PERF.md round 2).  Both are deterministic;
    # rbg is the TPU-appropriate generator for augmentation noise.
    rng = jax.random.key(args.seed + 1, impl="rbg")
    final_epoch = None
    for epoch in range(start_epoch, max_epoch):
        if args.device_resident:
            state, summary = executor.train_resident(
                state, train_corpus, rng, scheduler.lr, epoch, batch_size
            )
            cv = executor.cv_resident(state, cv_corpus, batch_size, epoch)
        else:
            train_dataset.set_epoch(epoch)
            state, summary = executor.train(
                state, train_dataset, rng, scheduler.lr, epoch
            )
            cv = executor.cv(state, cv_dataset, epoch)
        logging.info(
            "Epoch %d done: train_loss %.6f cv_loss %.6f cv_acc %.4f "
            "throughput %.1f audio-s/s",
            epoch, summary["train_loss"], cv["cv_loss"], cv["cv_acc"],
            summary["audio_seconds_per_s"],
        )
        if jax.process_index() == 0:
            save_checkpoint(
                os.path.join(args.model_dir, f"{epoch}.ckpt"),
                state.params,
                state.batch_stats,
                {"epoch": epoch, "lr": scheduler.lr,
                 "cv_loss": cv["cv_loss"]},
            )
        if writer is not None:
            writer.add_scalars(
                {"cv_loss": cv["cv_loss"], "cv_acc": cv["cv_acc"],
                 "lr": scheduler.lr,
                 "train_loss": summary["train_loss"]},
                step=epoch,
            )
            writer.flush()
        scheduler.step(cv["cv_loss"])
        final_epoch = epoch

    if final_epoch is not None and jax.process_index() == 0:
        link_final(args.model_dir, final_epoch)


if __name__ == "__main__":
    main()
