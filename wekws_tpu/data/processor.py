"""Host-side pipeline stages (chain of generators over sample dicts).

Stage semantics mirror the reference processors
(/root/reference/wekws/dataset/processor.py) but operate on numpy
waveforms and STOP at the waveform level: feature extraction, spec_aug,
context expansion and frame skipping all run **on device** inside the
jitted train step (wekws_tpu/data/device_pipeline.py) — the TPU-first
split of responsibilities.  Host stages: parse -> filter -> resample ->
speed_perturb -> reverb/noise -> shuffle -> batch (bucket-padded).

Sample dict: {key, txt, wav (np.float32 [-1,1]), sample_rate, label,
label length}.  Batches are dicts of fixed-shape numpy arrays.
"""

import json
import logging
import random
from typing import Dict, Iterable, Iterator, List, Optional

import numpy as np

from wekws_tpu.data import audio
from wekws_tpu.data.blobstore import BlobData


def parse_raw(data: Iterable[dict]) -> Iterator[dict]:
    """JSONL {key, wav, txt[, duration]} lines -> loaded samples.

    Unreadable files are skipped with a warning (processor.py:55-56)."""
    for sample in data:
        obj = json.loads(sample["src"]) if "src" in sample else sample
        try:
            wave, sr = audio.read_wav(obj["wav"])
        except Exception:
            logging.warning("Failed to read %s", obj.get("wav"))
            continue
        yield dict(
            key=obj["key"], txt=obj["txt"], wav=wave, sample_rate=sr
        )


def tokenize(data: Iterable[dict], tokenizer) -> Iterator[dict]:
    """txt -> label.  Integer txt (CE / max-pooling class index) passes
    through; otherwise the tokenizer maps text to token ids."""
    for sample in data:
        txt = sample["txt"]
        if isinstance(txt, int) or (
            isinstance(txt, str) and txt.lstrip("-").isdigit()
        ):
            sample["label"] = int(txt)
        elif tokenizer is not None:
            _, ids = tokenizer.tokenize(str(txt))
            sample["label"] = list(ids)
        else:
            # raw text label with no tokenizer (e.g. scoring paths that
            # only need keys): filler id, the txt stays on the sample
            sample["label"] = -1
        yield sample


def filter_length(
    data: Iterable[dict],
    max_length: int = 10240,
    min_length: int = 10,
    token_max_length: int = 200,
    token_min_length: int = 1,
    **unused,
) -> Iterator[dict]:
    """Drop samples outside [min, max] length in 10ms frames and (for
    token-sequence labels) outside token-count bounds."""
    for sample in data:
        num_frames = len(sample["wav"]) / sample["sample_rate"] * 100
        if num_frames < min_length or num_frames > max_length:
            continue
        label = sample.get("label")
        if isinstance(label, list):
            if not (token_min_length <= len(label) <= token_max_length):
                continue
        yield sample


def resample(data: Iterable[dict], resample_rate: int = 16000) -> Iterator[dict]:
    for sample in data:
        if sample["sample_rate"] != resample_rate:
            sample["wav"] = audio.resample(
                sample["wav"], sample["sample_rate"], resample_rate
            )
            sample["sample_rate"] = resample_rate
        yield sample


def speed_perturb(
    data: Iterable[dict], speeds: Optional[List[float]] = None
) -> Iterator[dict]:
    if speeds is None:
        speeds = [0.9, 1.0, 1.1]
    for sample in data:
        speed = random.choice(speeds)
        if speed != 1.0:
            sample["wav"] = audio.speed_perturb(sample["wav"], speed)
        yield sample


def add_reverb(
    data: Iterable[dict], reverb_source: BlobData, aug_prob: float
) -> Iterator[dict]:
    """Convolve with a random RIR (L2-normalized), truncated to the
    original length (processor.py:374-392)."""
    from scipy.signal import fftconvolve

    for sample in data:
        if aug_prob > random.random():
            wave = sample["wav"]
            _, rir_bytes = reverb_source.random_one()
            rir, _ = audio.read_wav(rir_bytes)
            norm = np.sqrt(np.sum(rir ** 2))
            if norm > 0:
                rir = rir / norm
                sample["wav"] = fftconvolve(wave, rir, mode="full")[
                    : len(wave)
                ].astype(np.float32)
        yield sample


_SNR_RANGES = {"noise": (0, 15), "speech": (5, 30), "music": (5, 15)}


def add_noise(
    data: Iterable[dict], noise_source: BlobData, aug_prob: float
) -> Iterator[dict]:
    """Additive noise at an SNR drawn per noise-key prefix
    (processor.py:395-430)."""
    for sample in data:
        if aug_prob > random.random():
            wave = sample["wav"]
            n = len(wave)
            key, noise_bytes = noise_source.random_one()
            prefix = str(key).split("/")[-1].split("_")[0]
            lo, hi = _SNR_RANGES.get(prefix, (0, 15))
            noise, _ = audio.read_wav(noise_bytes)
            if len(noise) > n:
                start = random.randint(0, len(noise) - n)
                noise = noise[start : start + n]
            else:
                noise = np.resize(noise, (n,))
            audio_db = 10 * np.log10(np.mean(wave ** 2) + 1e-4)
            noise_db = 10 * np.log10(np.mean(noise ** 2) + 1e-4)
            snr = random.uniform(lo, hi)
            scale = np.sqrt(10 ** ((audio_db - noise_db - snr) / 10))
            sample["wav"] = (wave + scale * noise).astype(np.float32)
        yield sample


def shuffle(data: Iterable[dict], shuffle_size: int = 1000) -> Iterator[dict]:
    buf = []
    for sample in data:
        buf.append(sample)
        if len(buf) >= shuffle_size:
            random.shuffle(buf)
            yield from buf
            buf = []
    random.shuffle(buf)
    yield from buf


def round_up(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def batch(
    data: Iterable[dict],
    batch_size: int = 16,
    bucket_samples: int = 16000,
    max_label_len_default: int = 1,
    drop_last: bool = False,
    wave_scale: float = 32768.0,
    fixed_samples: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """Batch samples into fixed-shape arrays.

    Waveforms are padded to the next multiple of ``bucket_samples`` of
    the batch max so XLA sees a small, bounded set of shapes (SURVEY.md
    §7 hard part (d)), and scaled to int16 range (the training feature
    convention, processor.py:194: wave * (1 << 15)).
    ``fixed_samples`` pads EVERY batch to one sample count (and drops
    longer utterances) — required for multi-host training, where all
    processes must contribute identically shaped shards each step.

    Yields {keys, waves (B,S), wave_lengths (B,), target, target_lengths}.
    Integer labels -> target (B,); token sequences -> (B,U) padded -1.
    """
    buf: List[dict] = []
    if fixed_samples:
        data = (s for s in data if len(s["wav"]) <= fixed_samples)

    def emit(samples: List[dict]) -> Dict[str, np.ndarray]:
        b = len(samples)
        smax = fixed_samples or round_up(
            max(len(s["wav"]) for s in samples), bucket_samples
        )
        waves = np.zeros((b, smax), np.float32)
        lengths = np.zeros((b,), np.int32)
        for i, s in enumerate(samples):
            n = len(s["wav"])
            waves[i, :n] = s["wav"] * wave_scale
            lengths[i] = n
        labels = [s.get("label", 0) for s in samples]
        if labels and isinstance(labels[0], list):
            umax = max(max((len(l) for l in labels), default=1), 1)
            target = np.full((b, umax), -1, np.int32)
            target_lengths = np.zeros((b,), np.int32)
            for i, l in enumerate(labels):
                target[i, : len(l)] = l
                target_lengths[i] = len(l)
        else:
            target = np.asarray(labels, np.int32)
            target_lengths = np.ones((b,), np.int32)
        return dict(
            keys=[s["key"] for s in samples],
            waves=waves,
            wave_lengths=lengths,
            target=target,
            target_lengths=target_lengths,
        )

    for sample in data:
        buf.append(sample)
        if len(buf) >= batch_size:
            yield emit(buf)
            buf = []
    if buf and not drop_last:
        yield emit(buf)
