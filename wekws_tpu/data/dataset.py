"""Dataset composition: data.list -> shard -> stages -> batches.

Replaces both reference data paths (the external-wenet wrapper at
/root/reference/wekws/dataset/init_dataset.py:70-101 and the legacy
chain at dataset.py:119-186) with one numpy pipeline that ends at
padded waveform batches; features are computed on device
(device_pipeline.py).

Sharding follows the reference DistributedSampler
(dataset.py:51-97): the epoch-seeded shuffled file list is sliced
``rank::world_size`` (here: jax process index/count, overridable for
tests) — per-epoch reshuffling via ``set_epoch``.
"""

import copy
import random
from typing import Iterator, List, Optional

from wekws_tpu.data import processor
from wekws_tpu.data.blobstore import open_store


class DataList:
    """Epoch-aware sharded view of a list of JSONL lines."""

    def __init__(
        self,
        lines: List[str],
        shuffle: bool = True,
        partition: bool = True,
        rank: int = 0,
        world_size: int = 1,
    ):
        self.lines = lines
        self.shuffle = shuffle
        self.partition = partition
        self.rank = rank
        self.world_size = world_size
        self.worker_id = 0
        self.num_workers = 1
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def set_worker(self, worker_id: int, num_workers: int) -> None:
        """Second-level sharding across loader workers (the reference's
        rank -> worker two-level slicing, dataset.py:82-97)."""
        self.worker_id = worker_id
        self.num_workers = num_workers

    def __iter__(self) -> Iterator[dict]:
        data = list(range(len(self.lines)))
        if self.shuffle:
            random.Random(self.epoch).shuffle(data)
        if self.partition:
            if self.world_size > 1 and len(data) % self.world_size:
                # equalize shard sizes by wraparound so every process
                # sees the same number of batches (multi-host training
                # steps must stay in lockstep)
                data = data + data[: self.world_size
                                   - len(data) % self.world_size]
            data = data[self.rank :: self.world_size]
        if self.num_workers > 1:
            data = data[self.worker_id :: self.num_workers]
        for i in data:
            yield {"src": self.lines[i]}


class Dataset:
    """Composable host pipeline yielding fixed-shape numpy batches."""

    def __init__(
        self,
        data_list_file: str,
        conf: dict,
        tokenizer=None,
        split: str = "train",
        rank: Optional[int] = None,
        world_size: Optional[int] = None,
        seed: int = 777,
    ):
        conf = copy.deepcopy(conf)
        if split != "train":
            scrub_conf(conf)
        self.conf = conf
        self.split = split
        self.tokenizer = tokenizer
        self.seed = seed
        if rank is None or world_size is None:
            import jax

            rank = jax.process_index()
            world_size = jax.process_count()
        with open(data_list_file, "r", encoding="utf8") as f:
            lines = [line.strip() for line in f if line.strip()]
        self.data_list = DataList(
            lines,
            shuffle=conf.get("shuffle", split == "train"),
            partition=(split != "test"),
            rank=rank,
            world_size=world_size,
        )
        self._noise_store = None
        self._reverb_store = None
        if split == "train":
            if conf.get("noise_prob", 0) > 0 and conf.get("noise_source"):
                self._noise_store = open_store(conf["noise_source"], seed)
            if conf.get("reverb_prob", 0) > 0 and conf.get("reverb_source"):
                self._reverb_store = open_store(conf["reverb_source"], seed)

    def set_epoch(self, epoch: int) -> None:
        self.data_list.set_epoch(epoch)
        random.seed(self.seed + epoch)

    def __iter__(self):
        conf = self.conf
        it = iter(self.data_list)
        it = processor.parse_raw(it)
        it = processor.tokenize(it, self.tokenizer)
        it = processor.filter_length(it, **conf.get("filter_conf", {}))
        it = processor.resample(
            it, conf.get("resample_conf", {}).get("resample_rate", 16000)
        )
        if self.split == "train":
            if conf.get("speed_perturb", False):
                it = processor.speed_perturb(it)
            if self._reverb_store is not None:
                it = processor.add_reverb(
                    it, self._reverb_store, conf.get("reverb_prob", 0.0)
                )
            if self._noise_store is not None:
                it = processor.add_noise(
                    it, self._noise_store, conf.get("noise_prob", 0.0)
                )
        if conf.get("shuffle", False):
            it = processor.shuffle(
                it, conf.get("shuffle_conf", {}).get("shuffle_size", 1000)
            )
        bc = conf.get("batch_conf", {})
        it = processor.batch(
            it,
            batch_size=bc.get("batch_size", 16),
            bucket_samples=bc.get("bucket_samples", 16000),
            drop_last=bc.get("drop_last", self.split == "train"),
            fixed_samples=bc.get("fixed_samples", 0),
        )
        return it


def scrub_conf(conf: dict) -> dict:
    """Disable augmentation/shuffle for cv/test
    (train.py:107-111, init_dataset.py:81-90 semantics)."""
    conf["speed_perturb"] = False
    conf["spec_aug"] = False
    conf["noise_prob"] = 0.0
    conf["reverb_prob"] = 0.0
    conf["shuffle"] = False
    for key in ("fbank_conf", "mfcc_conf", "feature_extraction_conf"):
        if key in conf:
            conf[key]["dither"] = 0.0
    return conf


def init_dataset(
    data_list_file: str,
    conf: dict,
    tokenizer=None,
    split: str = "train",
    **kwargs,
) -> Dataset:
    return Dataset(data_list_file, conf, tokenizer, split, **kwargs)
