"""Jitted train / cv steps with data-parallel sharding.

The training hot loop (reference Executor.train,
/root/reference/wekws/utils/executor.py:28-68) as pure jitted
functions:

  waveform batch (sharded over the 'data' mesh axis)
    -> on-device fbank + augmentation (DeviceFeaturePipeline)
    -> model forward (params replicated)
    -> criterion -> grads -> clip-by-global-norm -> Adam update,
       skipped entirely when the gradient is non-finite
       (executor.py:62-64 semantics)

XLA inserts the gradient all-reduce because replicated params consume a
sharded batch — the DDP equivalent with zero framework code.  Both the
feature pipeline and the model live inside one jit so feature
extraction, augmentation and the first conv/matmul fuse into a single
program per batch shape.
"""

from functools import partial
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from wekws_tpu.data.device_pipeline import DeviceFeaturePipeline
from wekws_tpu.losses import criterion, criterion_per_utt


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(
    learning_rate: float,
    grad_clip: float = 5.0,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """Adam preceded by global-norm clipping and (torch-style) L2
    weight decay folded into the gradient (train.py:201-209 semantics:
    torch.optim.Adam(weight_decay=...) adds wd*param to the gradient
    before the moment updates)."""

    @optax.inject_hyperparams
    def opt(learning_rate):
        chain = [optax.clip_by_global_norm(grad_clip)]
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        chain.append(optax.scale_by_adam())
        chain.append(optax.scale_by_learning_rate(learning_rate))
        # flatten: run the whole chain on one raveled vector instead of
        # ~50 tiny per-leaf arrays — the Adam/clip tail was ~1500 tiny
        # ops per step (round-1 profile: 4031 ops/step total), all
        # dispatch overhead at these model sizes
        return optax.flatten(optax.chain(*chain))

    return opt(learning_rate)


class Trainer:
    """Builds jitted train/cv steps for a (model, pipeline, criterion).

    Args:
        model: KWSModel (flax module).
        pipeline: DeviceFeaturePipeline (train-mode).
        cv_pipeline: scrubbed pipeline (no dither/spec_aug).
        criterion_type: 'ce' | 'max_pooling' | 'ctc'.
    """

    def __init__(
        self,
        model,
        pipeline: DeviceFeaturePipeline,
        cv_pipeline: DeviceFeaturePipeline,
        criterion_type: str,
        learning_rate: float = 1e-3,
        grad_clip: float = 5.0,
        weight_decay: float = 0.0,
        min_duration: int = 0,
    ):
        self.model = model
        self.pipeline = pipeline
        self.cv_pipeline = cv_pipeline
        self.criterion_type = criterion_type
        self.min_duration = min_duration
        self.optimizer = make_optimizer(
            learning_rate, grad_clip, weight_decay
        )
        # NOTE: no buffer donation. Donating the state forces a
        # synchronous ~1.1s round-trip per step on tunneled TPU
        # backends (measured: 1116ms donated vs 12ms without, identical
        # program), and these models are far too small for the
        # double-buffering to matter.
        self._train_step = jax.jit(self._train_step_impl)
        self._cv_step = jax.jit(self._cv_step_impl)

    # ---------------- state init ----------------

    def init_state(
        self, rng: jax.Array, example_batch: Dict, mesh=None
    ) -> TrainState:
        # One jitted program for pipeline+init: eager (op-by-op)
        # initialization at real batch shapes dispatches thousands of
        # individually-compiled primitives through the backend — tens
        # of minutes on a tunneled TPU for a (512, 96000) batch
        # (observed on the synthetic_scale recipe) vs seconds jitted.
        @jax.jit
        def _init(rng, waves, lengths):
            feats, feat_lengths = self.cv_pipeline(waves, lengths)
            return self.model.init(rng, feats, lengths=feat_lengths)

        variables = _init(
            rng,
            jnp.asarray(example_batch["waves"]),
            jnp.asarray(example_batch["wave_lengths"]),
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.optimizer.init(params),
        )
        if mesh is not None:
            # commit replicated across the mesh so the first train step
            # compiles with the steady-state shardings
            from wekws_tpu.parallel.mesh import replicated

            state = jax.device_put(state, replicated(mesh))
        return state

    # ---------------- train ----------------

    def _forward(
        self, params, batch_stats, feats, feat_lengths, dropout_rng, train
    ):
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            (logits, _), updates = self.model.apply(
                variables,
                feats,
                lengths=feat_lengths,
                train=True,
                rngs={"dropout": dropout_rng},
                mutable=["batch_stats"],
            )
            return logits, updates.get("batch_stats", batch_stats)
        logits, _ = self.model.apply(variables, feats, lengths=feat_lengths)
        return logits, batch_stats

    def _train_step_impl(
        self,
        state: TrainState,
        batch: Dict[str, jnp.ndarray],
        rng: jax.Array,
        learning_rate: jnp.ndarray,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        rng = jax.random.fold_in(rng, state.step)
        feat_rng, dropout_rng = jax.random.split(rng)

        def loss_fn(params):
            feats, feat_lengths = self.pipeline(
                batch["waves"], batch["wave_lengths"], rng=feat_rng
            )
            logits, new_stats = self._forward(
                params, state.batch_stats, feats, feat_lengths,
                dropout_rng, True,
            )
            loss, acc = criterion(
                self.criterion_type,
                logits,
                batch["target"],
                feat_lengths,
                batch.get("target_lengths"),
                self.min_duration,
                valid=batch.get("valid"),
            )
            return loss, (acc, new_stats)

        (loss, (acc, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        grad_norm = optax.global_norm(grads)
        is_finite = jnp.isfinite(grad_norm)
        # zero grads when non-finite so adam moments stay clean, and
        # freeze the update (reference skips optimizer.step entirely)
        safe_grads = jax.tree_util.tree_map(
            lambda g: jnp.where(is_finite, g, jnp.zeros_like(g)), grads
        )
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = jnp.where(
            is_finite, learning_rate, 0.0
        )
        updates, new_opt_state = self.optimizer.update(
            safe_grads, opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        metrics = {
            "loss": loss,
            "acc": acc,
            "grad_norm": grad_norm,
            "skipped": 1.0 - is_finite.astype(jnp.float32),
        }
        return new_state, metrics

    def train_step(self, state, batch, rng, learning_rate):
        # Cache the device scalar: a fresh device_put per step forces a
        # dispatch-pipeline sync on tunneled backends (measured ~680ms
        # per step vs ~9ms with a reused buffer).
        lr = float(learning_rate)
        if getattr(self, "_lr_value", None) != lr:
            self._lr_value = lr
            self._lr_device = jnp.asarray(lr, jnp.float32)
        return self._train_step(state, batch, rng, self._lr_device)

    # ---------------- cv ----------------

    def _cv_step_impl(
        self, state: TrainState, batch: Dict[str, jnp.ndarray]
    ) -> Dict[str, jnp.ndarray]:
        feats, feat_lengths = self.cv_pipeline(
            batch["waves"], batch["wave_lengths"]
        )
        logits, _ = self._forward(
            state.params, state.batch_stats, feats, feat_lengths, None, False
        )
        loss_b, correct_b = criterion_per_utt(
            self.criterion_type,
            logits,
            batch["target"],
            feat_lengths,
            batch.get("target_lengths"),
            self.min_duration,
        )
        # reduce to replicated scalars inside jit: works for globally
        # sharded multi-host batches (per-row arrays would not be
        # addressable on every process); padded/non-finite rows are
        # excluded exactly (reference executor.py:103 semantics)
        valid = batch.get(
            "valid", jnp.ones(loss_b.shape[0], jnp.float32)
        )
        ok = valid * jnp.isfinite(loss_b).astype(jnp.float32)
        out = {
            "loss_sum": jnp.sum(jnp.where(ok > 0, loss_b, 0.0)),
            "correct_sum": jnp.sum(correct_b * ok),
            "count": jnp.sum(ok),
        }
        return out

    def cv_step(self, state, batch):
        return self._cv_step(state, batch)

    def _cv_step_full_impl(self, state, batch):
        """Per-utterance outputs (single-host decode paths)."""
        feats, feat_lengths = self.cv_pipeline(
            batch["waves"], batch["wave_lengths"]
        )
        logits, _ = self._forward(
            state.params, state.batch_stats, feats, feat_lengths, None, False
        )
        loss_b, correct_b = criterion_per_utt(
            self.criterion_type, logits, batch["target"], feat_lengths,
            batch.get("target_lengths"), self.min_duration,
        )
        out = {"loss_b": loss_b, "correct_b": correct_b,
               "feat_lengths": feat_lengths}
        if self.criterion_type == "ctc":
            out["log_probs"] = jax.nn.log_softmax(logits, axis=-1)
        return out

    def cv_step_full(self, state, batch):
        if not hasattr(self, "_cv_step_full"):
            self._cv_step_full = jax.jit(self._cv_step_full_impl)
        return self._cv_step_full(state, batch)

    # ---------------- inference ----------------

    @partial(jax.jit, static_argnums=(0, 4))
    def forward(self, state, waves, wave_lengths, softmax=False):
        """Whole-utterance posterior computation for scoring."""
        feats, feat_lengths = self.cv_pipeline(waves, wave_lengths)
        variables = {
            "params": state.params, "batch_stats": state.batch_stats,
        }
        logits, _ = self.model.apply(
            variables, feats, lengths=feat_lengths, softmax=softmax
        )
        return logits, feat_lengths
