"""Device-resident epoch mode: zero per-step H2D training.

The host-feeding analysis (PERF.md round 3) showed the delivered
training rate is bounded by per-step host->device transfers, not by
device compute: the chip sustains ~150k audio-s/s on a resident batch
while the host chain delivers a fraction of that.  A KWS corpus is
small (50 h of 16 kHz int16 ~= 5.8 GB — it FITS in one chip's HBM), so
the TPU-native fix is to stage the epoch's waveforms on device ONCE
and do shuffle/batch/slice *on device*:

  stage (one H2D)      waves (N,S) int16 + lengths + targets -> HBM
  per epoch (tiny H2D) (steps, B) int32 batch-index matrix
  per step (zero H2D)  gather rows -> on-device fbank/spec_aug ->
                       forward/backward/Adam — one XLA dispatch

Reference semantics preserved (studied, not copied):
* epoch-seeded shuffle: the per-epoch permutation is
  ``random.Random(epoch).shuffle(range(N))`` — bit-identical to the
  reference DistributedSampler order
  (/root/reference/wekws/dataset/dataset.py:82-97) and to this
  framework's own DataList.
* fixed-size batches with drop_last for train
  (/root/reference/wekws/dataset/processor.py:314-331); cv keeps the
  remainder batch exact via the ``valid`` mask.
* feature-space augmentation (dither, spec_aug) still runs on device
  per step with per-step RNG — resident mode changes WHERE batches
  come from, not the training math.

Waveform-space augmentation (speed perturb, noise/reverb mixing) can
run on device too: attach ``data/device_aug.DeviceWaveAug`` to the
train pipeline (bin/train.py wires this automatically) and the chain
joins the same jitted step, with the staged banks threaded through as
arguments.  Without it, ``stage_data_list`` raises on augmented
configs rather than silently training un-augmented.

Sharding: on a single process the staged arrays are REPLICATED across
the mesh when they fit a per-device HBM budget (each device then
gathers its batch shard locally — zero collectives), else sharded over
``('data',)`` (GSPMD inserts the gather collectives, which ride ICI).
Multi-process staging shards by construction (each process stages its
equalized DataList shard and the global array is assembled from the
local shards).
"""

import copy
import logging
import random
import threading
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wekws_tpu.data import processor
from wekws_tpu.data.dataset import DataList, scrub_conf
from wekws_tpu.parallel.mesh import data_sharding, replicated

# Per-device byte budget under which a single-process staging is
# replicated instead of sharded (local gathers, zero collectives).
# ~8 GB leaves half of a v5e's 16 GB HBM for activations at B=1024.
REPLICATE_BUDGET_BYTES = 8 << 30


@dataclass
class ResidentCorpus:
    """A staged, device-resident corpus.

    ``arrays``: dict of jax Arrays with leading dim N —
    waves (N, S), wave_lengths (N,), target (N,) or (N, U),
    target_lengths (N,), valid (N,).
    """

    arrays: Dict[str, jax.Array]
    n: int                      # rows (incl. wraparound duplicates)
    audio_seconds: float        # total real audio staged (valid rows)
    keys: List[str] = field(default_factory=list)
    # host copy of per-row sample counts: per-epoch audio accounting
    # without any device read-back
    host_wave_lengths: Optional[np.ndarray] = None
    sample_rate: int = 16000
    # background upload-forcer (see stage_arrays force_upload):
    # join()s when the corpus is fully device-resident
    upload_thread: Optional[threading.Thread] = None
    upload_seconds: Optional[float] = None

    def wait_uploaded(self) -> Optional[float]:
        """Block until the staged buffers are device-resident; returns
        the measured upload seconds (None if staging was lazy)."""
        if self.upload_thread is not None:
            self.upload_thread.join()
            self.upload_thread = None
        return self.upload_seconds

    @property
    def nbytes(self) -> int:
        return sum(int(np.prod(a.shape)) * a.dtype.itemsize
                   for a in self.arrays.values())

    def epoch_index(
        self, epoch: int, batch_size: int, shuffle: bool = True,
        drop_last: bool = True,
    ) -> np.ndarray:
        """(steps, B) int32 batch-index matrix for ``epoch``.

        Shuffle order is ``random.Random(epoch)`` over row indices —
        bit-identical to DataList/the reference sampler.  With
        ``drop_last=False`` the tail batch wraps around to the front of
        the permutation (train fill must be valid rows; cv exactness
        is handled by ``cv_index`` instead)."""
        idx = list(range(self.n))
        if shuffle:
            random.Random(epoch).shuffle(idx)
        if drop_last:
            steps = len(idx) // batch_size
        else:
            steps = (len(idx) + batch_size - 1) // batch_size
            idx = idx + idx[: steps * batch_size - len(idx)]
        if steps == 0:
            raise ValueError(
                f"corpus of {self.n} rows < batch_size {batch_size}"
            )
        return np.asarray(
            idx[: steps * batch_size], np.int32
        ).reshape(steps, batch_size)

    def cv_index(self, batch_size: int) -> Tuple[np.ndarray, np.ndarray]:
        """Sequential (steps, B) index + (steps, B) validity override.

        The tail batch is padded by repeating row 0; the validity
        override zeroes those slots so cv accumulation stays exact
        (executor cv semantics)."""
        steps = (self.n + batch_size - 1) // batch_size
        pad = steps * batch_size - self.n
        idx = np.concatenate(
            [np.arange(self.n, dtype=np.int32),
             np.zeros((pad,), np.int32)]
        ).reshape(steps, batch_size)
        ok = np.concatenate(
            [np.ones((self.n,), np.float32), np.zeros((pad,), np.float32)]
        ).reshape(steps, batch_size)
        return idx, ok


def _build_arrays(
    samples: List[dict], wire_dtype: str, wave_scale: float = 32768.0
) -> Tuple[Dict[str, np.ndarray], List[str]]:
    """Pack samples (each with wav/label/key) into fixed-shape arrays
    padded to the corpus max — the one-shot analog of
    processor._emit_batch over the whole list."""
    if not samples:
        raise ValueError("no samples survived the filter stages")
    smax = max(len(s["wav"]) for s in samples)
    batch = processor._emit_batch(
        samples, smax, wave_scale, wire_dtype=wire_dtype
    )
    keys = batch.pop("keys")
    return batch, keys


def stage_data_list(
    data_list_file: str,
    conf: dict,
    tokenizer=None,
    split: str = "train",
    mesh=None,
    rank: Optional[int] = None,
    world_size: Optional[int] = None,
    wire_dtype: Optional[str] = None,
    replicate_budget_bytes: int = REPLICATE_BUDGET_BYTES,
    device_aug: bool = False,
) -> ResidentCorpus:
    """Read + decode the corpus once on the host and stage it on device.

    Runs the same pre-batch host stages as the streaming Dataset
    (parse_raw -> tokenize -> filter -> resample) in canonical list
    order; shuffling happens per epoch on the staged rows instead.
    Multi-process: stages this process's equalized DataList shard and
    assembles the global sharded array.
    """
    conf = copy.deepcopy(conf)
    if split != "train":
        scrub_conf(conf)
    if split == "train" and not device_aug and (
        conf.get("speed_perturb", False)
        or conf.get("noise_prob", 0) > 0
        or conf.get("reverb_prob", 0) > 0
    ):
        raise ValueError(
            "device-resident mode stages raw waves once; waveform "
            "augmentation (speed_perturb/noise/reverb) needs either "
            "the streaming host pipeline (drop --device_resident) or "
            "the device-side augmentation chain — attach "
            "data/device_aug.DeviceWaveAug to the train pipeline and "
            "pass device_aug=True here (bin/train.py does this "
            "automatically)"
        )
    if rank is None or world_size is None:
        rank = jax.process_index()
        world_size = jax.process_count()
    with open(data_list_file, "r", encoding="utf8") as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    dl = DataList(
        lines, shuffle=False, partition=(split != "test" or world_size > 1),
        rank=rank, world_size=world_size,
    )
    it = iter(dl)
    it = processor.parse_raw(it)
    it = processor.tokenize(it, tokenizer)
    it = processor.filter_length(it, **conf.get("filter_conf", {}))
    it = processor.resample(
        it, conf.get("resample_conf", {}).get("resample_rate", 16000)
    )
    samples = list(it)
    if wire_dtype is None:
        wire_dtype = conf.get("batch_conf", {}).get("wire_dtype", "int16")
    arrays, keys = _build_arrays(samples, wire_dtype)
    # equalize shard lengths across processes (wraparound, the DataList
    # contract) so the global array assembles evenly
    if world_size > 1:
        target_rows = -(-len(lines) // world_size)
        short = target_rows - arrays["waves"].shape[0]
        if short > 0:
            for k, v in arrays.items():
                arrays[k] = np.concatenate([v, v[:short]], axis=0)
            keys = keys + keys[:short]
    sr = conf.get("resample_conf", {}).get("resample_rate", 16000)
    audio_s = float(arrays["wave_lengths"].sum()) / sr
    return stage_arrays(
        arrays, mesh=mesh, keys=keys, audio_seconds=audio_s,
        replicate_budget_bytes=replicate_budget_bytes,
    )


def _force_upload(corpus: "ResidentCorpus") -> None:
    """Force the staged buffers onto the device by EXECUTING a tiny
    program that references them.

    On tunneled backends ``device_put`` + ``block_until_ready`` can
    return before any bytes move: the upload is LAZY, deferred to the
    first program that consumes the buffer (measured r5 — the true
    pipe is ~30-45 MB/s, and every earlier 'staging at ~1.6 GB/s'
    reading was the enqueue, with the real upload hiding in the
    untimed warmup).  Running this on a background thread while the
    main thread compiles the train step overlaps the upload with the
    compile RPC (measured concurrent: a 15 s upload completed inside
    a 20 s compile), so staging costs a real run ~nothing — and the
    bench can time it honestly."""
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    arrs = list(corpus.arrays.values())

    def touch(*xs):
        tot = jnp.zeros((), jnp.int32)
        for x in xs:
            tot = tot + x.reshape(-1)[:1].astype(jnp.int32).sum()
        return tot

    y = jax.jit(touch)(*arrs)
    np.asarray(y)
    corpus.upload_seconds = time.perf_counter() - t0


def _put_chunked(v: np.ndarray, threads: int, sharding=None):
    """device_put with the host-side enqueue parallelized.

    The enqueue (serialize/copy into the transport) runs ~0.5-1 GB/s
    single-threaded and scales ~linearly with threads (measured 4.46
    GB/s at 4 on the r5 rig), so large arrays are row-split, enqueued
    from a thread pool and re-joined by ONE async device-side
    concatenate — whose execution (and the lazy wire upload it forces)
    rides the dispatch queue behind the caller's compiles instead of
    blocking here.

    Default threads=1 on THIS rig: the concatenate's jit dispatch
    compiles synchronously (~0.6 s through the tunnel), which eats the
    ~0.4 s the threads save (measured r5).  On backends with local
    compilers the threaded path wins; the knob is per-call."""
    import concurrent.futures as cf

    if threads <= 1 or v.nbytes < (64 << 20) or v.shape[0] < threads:
        return (jax.device_put(v, sharding) if sharding is not None
                else jax.device_put(v))
    chunks = np.array_split(v, threads, axis=0)  # views, no host copy
    with cf.ThreadPoolExecutor(threads) as ex:
        parts = list(ex.map(jax.device_put, chunks))
    cat = jax.jit(lambda *xs: jnp.concatenate(xs, axis=0),
                  out_shardings=sharding)
    return cat(*parts)


def stage_arrays(
    arrays: Dict[str, np.ndarray],
    mesh=None,
    keys: Optional[List[str]] = None,
    audio_seconds: Optional[float] = None,
    replicate_budget_bytes: int = REPLICATE_BUDGET_BYTES,
    force_upload: str = "async",
    enqueue_threads: int = 1,
) -> ResidentCorpus:
    """Device-put pre-built numpy arrays as a ResidentCorpus.

    ``force_upload``: "async" (default) starts a background thread
    that forces the lazy tunnel upload while the caller compiles
    (see _force_upload); "sync" blocks until resident; "lazy" keeps
    the historical behavior (upload deferred to first use).
    ``enqueue_threads``: parallel host-side enqueue for large arrays
    on single-device/single-process staging (_put_chunked)."""
    n = int(arrays["waves"].shape[0])
    if "valid" not in arrays:
        arrays = dict(arrays)
        arrays["valid"] = np.ones((n,), np.float32)
    nbytes = sum(a.nbytes for a in arrays.values())
    sample_rate = 16000
    if audio_seconds is None:
        audio_seconds = float(arrays["wave_lengths"].sum()) / sample_rate
    host_lengths: Optional[np.ndarray] = None
    if mesh is None:
        staged = {k: _put_chunked(v, enqueue_threads)
                  for k, v in arrays.items()}
        host_lengths = np.asarray(arrays["wave_lengths"])
    elif jax.process_count() > 1:
        # local shards assemble into the global sharded array; per-row
        # host accounting is unavailable (rows live on other hosts)
        sharding = data_sharding(mesh)
        staged = {
            k: jax.make_array_from_process_local_data(sharding, v)
            for k, v in arrays.items()
        }
        n = staged["waves"].shape[0]
    else:
        n_dev = int(np.prod(list(mesh.shape.values())))
        if nbytes <= replicate_budget_bytes or n_dev == 1:
            sharding = replicated(mesh)
        else:
            sharding = data_sharding(mesh)
            if n % n_dev:  # pad rows so axis 0 shards evenly
                pad = n_dev - n % n_dev
                arrays = {
                    k: np.concatenate([v, v[:pad]], axis=0)
                    for k, v in arrays.items()
                }
                n += pad
        threads = enqueue_threads if n_dev == 1 else 1
        staged = {k: _put_chunked(v, threads, sharding)
                  for k, v in arrays.items()}
        host_lengths = np.asarray(arrays["wave_lengths"])
    # NOTE: no block_until_ready here — it never guaranteed residency
    # (the tunnel upload is lazy) and WOULD block on the chunked
    # concat.  Residency is the force_upload thread's job; timing
    # honesty is the bench's overhang accounting.
    logging.info(
        "staged resident corpus: %d rows, %.1f audio-s, %.2f GB on device",
        n, audio_seconds, nbytes / 2**30,
    )
    corpus = ResidentCorpus(
        arrays=staged, n=n, audio_seconds=audio_seconds, keys=keys or [],
        host_wave_lengths=host_lengths, sample_rate=sample_rate,
    )
    if force_upload != "lazy" and jax.process_count() == 1:
        if force_upload == "sync":
            _force_upload(corpus)
        else:
            corpus.upload_thread = threading.Thread(
                target=_force_upload, args=(corpus,), daemon=True
            )
            corpus.upload_thread.start()
    return corpus


def make_resident_steps(trainer, mesh, steps_per_epoch: int):
    """Jitted (train_step, cv_step) closing over the trainer.

    train_step(state, staged, epoch_idx, rng, lr): derives the batch
    slot from ``state.step % steps_per_epoch``, gathers the rows on
    device and runs the standard train step — one dispatch, zero H2D.

    cv_step(state, staged, idx, ok): gathers rows ``idx`` (B,) with the
    validity override ``ok`` and runs the standard cv reduction.
    """
    shard = data_sharding(mesh)
    gather_keys = ("waves", "wave_lengths", "target", "target_lengths",
                   "valid")

    def _gather(staged, idx):
        batch = {}
        for k in gather_keys:
            if k in staged:
                v = jnp.take(staged[k], idx, axis=0)
                batch[k] = jax.lax.with_sharding_constraint(v, shard)
        return batch

    # Device-side waveform augmentation: the banks are too large to
    # ride into jit as closure constants (HTTP 413 from the tunneled
    # compiler; constants bloat any backend), so they are threaded as
    # the ``aug_leaves`` ARGUMENT and bound to the pipeline's
    # DeviceWaveAug template at trace time (restored right after —
    # tracing runs the body exactly once per compilation).
    aug_template = getattr(trainer.pipeline, "wave_aug", None)

    @jax.jit
    def train_step(state, staged, aug_leaves, epoch_idx, base, rng, lr):
        if aug_leaves and aug_template is None:
            raise ValueError(
                "aug_leaves passed but the pipeline had no wave_aug "
                "when this step was traced — the cached step would "
                "silently train un-augmented (Executor keys its cache "
                "on the wave_aug identity; direct callers must rebuild "
                "the steps after attaching wave_aug)"
            )
        # base = state.step at epoch start (device scalar): keeps the
        # slot counter aligned when resuming from a checkpoint whose
        # step count is not a multiple of steps_per_epoch
        i = jnp.mod(state.step - base, steps_per_epoch)
        idx = jax.lax.dynamic_index_in_dim(epoch_idx, i, keepdims=False)
        batch = _gather(staged, idx)
        if aug_template is not None:
            trainer.pipeline.wave_aug = aug_template.bind(aug_leaves)
        try:
            return trainer._train_step_impl(state, batch, rng, lr)
        finally:
            trainer.pipeline.wave_aug = aug_template

    @jax.jit
    def cv_step(state, staged, idx, ok):
        batch = _gather(staged, idx)
        batch["valid"] = batch["valid"] * ok
        return trainer._cv_step_impl(state, batch)

    return train_step, cv_step
