"""Epoch-level training driver.

Equivalent of the reference Executor
(/root/reference/wekws/utils/executor.py:23-115): one-epoch train loop
and cv loop with loss/acc accumulation (non-finite cv losses excluded,
executor.py:103).  Batches are sharded over the data mesh axis; cv
batches are padded to a device-count multiple with a validity mask so
remainder batches stay exact.
"""

import logging
import time
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from wekws_tpu.parallel.mesh import pad_batch_to_multiple, shard_batch


class Executor:
    def __init__(
        self,
        trainer,
        mesh,
        log_interval: int = 10,
        profile_dir: Optional[str] = None,
        metrics_path: Optional[str] = None,
    ):
        """``profile_dir`` enables a jax.profiler trace of a slice of
        each first epoch; ``metrics_path`` appends per-epoch JSONL
        records (the tensorboard-scalar analog, train.py:239-241)."""
        self.trainer = trainer
        self.mesh = mesh
        self.log_interval = log_interval
        self.profile_dir = profile_dir
        self.metrics_path = metrics_path
        self._profiled = False
        self.n_devices = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))

    def log_metrics(self, record: Dict) -> None:
        if self.metrics_path:
            import json

            with open(self.metrics_path, "a") as f:
                f.write(json.dumps(record) + "\n")

    def _iterate(self, dataset):
        """Overlap host batching with device compute: DataLoader
        iterates itself (worker processes); bare Datasets get the
        thread prefetcher."""
        from wekws_tpu.data.loader import DataLoader
        from wekws_tpu.data.prefetch import Prefetcher

        if isinstance(dataset, DataLoader):
            return iter(dataset)
        return iter(Prefetcher(dataset))

    def _prepare(self, batch: Dict) -> Dict:
        arrays_only = {
            k: v for k, v in batch.items() if isinstance(v, np.ndarray)
        }
        if jax.process_count() > 1:
            # multi-host: this process holds a shard; pad to the local
            # device multiple and assemble the global arrays
            from wekws_tpu.parallel.mesh import make_global_batch

            local = pad_batch_to_multiple(
                arrays_only, len(jax.local_devices())
            )
            return make_global_batch(local, self.mesh)
        padded = pad_batch_to_multiple(arrays_only, self.n_devices)
        return shard_batch(padded, self.mesh)

    def train(
        self, state, dataset, rng: jax.Array, lr: float, epoch: int
    ) -> Tuple[object, Dict[str, float]]:
        losses, accs, audio_seconds = [], [], 0.0
        start = time.time()
        n_batches = 0
        for idx, batch in enumerate(self._iterate(dataset)):
            if self.profile_dir and not self._profiled and idx == 3:
                jax.profiler.start_trace(self.profile_dir)
            audio_seconds += float(batch["wave_lengths"].sum()) / 16000.0
            device_batch = self._prepare(batch)
            state, metrics = self.trainer.train_step(
                state, device_batch, rng, lr
            )
            if self.profile_dir and not self._profiled and idx == 8:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                self._profiled = True
            n_batches += 1
            if idx % self.log_interval == 0:
                m = jax.device_get(metrics)
                losses.append(float(m["loss"]))
                accs.append(float(m["acc"]))
                logging.info(
                    "Epoch %d batch %d loss %.6f acc %.4f lr %.6g%s",
                    epoch, idx, m["loss"], m["acc"], lr,
                    " SKIPPED(non-finite)" if m["skipped"] else "",
                )
        elapsed = max(time.time() - start, 1e-9)
        summary = {
            "train_loss": float(np.mean(losses)) if losses else float("nan"),
            "train_acc": float(np.mean(accs)) if accs else float("nan"),
            "batches": n_batches,
            "audio_seconds_per_s": audio_seconds / elapsed,
        }
        self.log_metrics({"epoch": epoch, "lr": lr, **summary})
        return state, summary

    # ---------------- device-resident epoch mode ----------------

    def _resident_steps(self, steps_per_epoch: int):
        """Jitted resident train/cv steps, cached per epoch length AND
        per wave_aug identity: the step closes over the pipeline's
        DeviceWaveAug template at trace time (static fields bake into
        the trace), so attaching/replacing wave_aug after a first
        train_resident call must invalidate the cached step — a cache
        hit would silently train with the old (or no) augmentation."""
        aug = getattr(self.trainer.pipeline, "wave_aug", None)
        key = (steps_per_epoch, id(aug) if aug is not None else None)
        cache = getattr(self, "_resident_cache", None)
        if cache is None:
            cache = self._resident_cache = {}
        if key not in cache:
            from wekws_tpu.data.resident import make_resident_steps

            cache[key] = make_resident_steps(
                self.trainer, self.mesh, steps_per_epoch
            )
        return cache[key]

    def train_resident(
        self, state, corpus, rng: jax.Array, lr: float, epoch: int,
        batch_size: int, sync: bool = True,
    ) -> Tuple[object, Dict[str, float]]:
        """One epoch over a staged ResidentCorpus: the per-epoch batch
        index matrix is the only H2D (a few hundred KB); every step is
        one XLA dispatch that gathers, featurizes and trains on device.

        Shuffle order is Random(epoch) — identical to the streaming
        path's DataList.

        ``sync=False`` skips the end-of-epoch block_until_ready AND all
        per-batch metric fetches (each is a device round-trip — ~30 ms
        on tunneled backends, which dominates short epochs); callers
        must block themselves before timing.  Per-batch logging is also
        skipped whenever ``log_interval`` exceeds the epoch length."""
        import jax.numpy as jnp

        epoch_idx = corpus.epoch_index(epoch, batch_size)
        steps = epoch_idx.shape[0]
        train_step, _ = self._resident_steps(steps)
        idx_dev = jax.device_put(
            epoch_idx,
            jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec()
            ),
        )
        base = jnp.asarray(state.step)  # device scalar, no transfer
        lr_dev = self._resident_lr(lr)
        if corpus.host_wave_lengths is not None:
            audio_seconds = float(
                corpus.host_wave_lengths[epoch_idx].sum()
            ) / corpus.sample_rate
        else:
            audio_seconds = corpus.audio_seconds * (
                steps * batch_size / max(corpus.n, 1)
            )
        losses, accs = [], []
        start = time.time()
        metrics = None
        log_batches = sync and self.log_interval <= steps
        aug = getattr(self.trainer.pipeline, "wave_aug", None)
        aug_leaves = aug.leaves() if aug is not None else {}
        for idx in range(steps):
            state, metrics = train_step(
                state, corpus.arrays, aug_leaves, idx_dev, base, rng,
                lr_dev
            )
            if log_batches and idx % self.log_interval == 0:
                m = jax.device_get(metrics)
                losses.append(float(m["loss"]))
                accs.append(float(m["acc"]))
                logging.info(
                    "Epoch %d batch %d loss %.6f acc %.4f lr %.6g%s",
                    epoch, idx, m["loss"], m["acc"], lr,
                    " SKIPPED(non-finite)" if m["skipped"] else "",
                )
        if sync and metrics is not None:
            m = jax.device_get(metrics)
            if not losses:
                losses.append(float(m["loss"]))
                accs.append(float(m["acc"]))
        elapsed = max(time.time() - start, 1e-9)
        summary = {
            "train_loss": float(np.mean(losses)) if losses else float("nan"),
            "train_acc": float(np.mean(accs)) if accs else float("nan"),
            "batches": steps,
            "audio_seconds_per_s": audio_seconds / elapsed,
        }
        self.log_metrics({"epoch": epoch, "lr": lr, **summary})
        return state, summary

    def _resident_lr(self, lr: float):
        """Device-cached lr scalar (same rationale as Trainer.train_step:
        a fresh 4-byte device_put per step stalls tunneled backends)."""
        if getattr(self, "_res_lr_value", None) != float(lr):
            import jax.numpy as jnp

            self._res_lr_value = float(lr)
            self._res_lr_dev = jnp.asarray(lr, jnp.float32)
        return self._res_lr_dev

    def cv_resident(
        self, state, corpus, batch_size: int, epoch: int = 0
    ) -> Dict[str, float]:
        """Validation over a staged corpus: sequential batches, exact
        accounting via the validity override on the padded tail."""
        key = (id(corpus), batch_size)
        cache = getattr(self, "_resident_cv_cache", None)
        if cache is None:
            cache = self._resident_cv_cache = {}
        if key not in cache:
            idx, ok = corpus.cv_index(batch_size)
            cache[key] = (jax.device_put(idx), jax.device_put(ok))
        idx_dev, ok_dev = cache[key]
        _, cv_step = self._resident_steps(max(int(idx_dev.shape[0]), 1))
        total_loss, total_correct, total_utts = 0.0, 0.0, 0
        for i in range(idx_dev.shape[0]):
            out = jax.device_get(
                cv_step(state, corpus.arrays, idx_dev[i], ok_dev[i])
            )
            total_loss += float(out["loss_sum"])
            total_correct += float(out["correct_sum"])
            total_utts += int(out["count"])
        result = {
            "cv_loss": total_loss / max(total_utts, 1),
            "cv_acc": total_correct / max(total_utts, 1),
            "utts": total_utts,
        }
        logging.info(
            "Epoch %d CV loss %.6f acc %.4f (%d utts)",
            epoch, result["cv_loss"], result["cv_acc"], total_utts,
        )
        return result

    def cv(
        self, state, dataset, epoch: int = 0, decode_acc: bool = False
    ) -> Dict[str, float]:
        """Validation: exact per-utterance accumulation.

        ``decode_acc`` additionally runs the host-side CTC prefix-beam
        decode accuracy (reference loss.py:102-132), which is slow."""
        total_loss, total_correct, total_utts = 0.0, 0.0, 0
        decode_hits: Optional[list] = [] if decode_acc else None
        for batch in self._iterate(dataset):
            b_real = batch["waves"].shape[0]
            device_batch = self._prepare(batch)
            out = jax.device_get(self.trainer.cv_step(state, device_batch))
            total_loss += float(out["loss_sum"])
            total_correct += float(out["correct_sum"])
            total_utts += int(out["count"])
            if decode_acc and jax.process_count() == 1:
                from wekws_tpu.decode import acc_utterance

                full = jax.device_get(
                    self.trainer.cv_step_full(state, device_batch)
                )
                if "log_probs" in full:
                    probs = np.exp(full["log_probs"][:b_real])
                    decode_hits.append(
                        acc_utterance(
                            probs,
                            batch["target"],
                            full["feat_lengths"][:b_real],
                            batch["target_lengths"],
                        )
                    )
        result = {
            "cv_loss": total_loss / max(total_utts, 1),
            "cv_acc": total_correct / max(total_utts, 1),
            "utts": total_utts,
        }
        if decode_acc and decode_hits:
            result["cv_decode_acc"] = float(np.mean(decode_hits))
        logging.info(
            "Epoch %d CV loss %.6f acc %.4f (%d utts)",
            epoch, result["cv_loss"], result["cv_acc"], total_utts,
        )
        return result

    def test(self, state, dataset, epoch: int = 0) -> Dict[str, float]:
        """Test-set evaluation — same accumulation as cv
        (reference Executor.test, executor.py:114-115)."""
        return self.cv(state, dataset, epoch)
