"""On-device feature pipeline: fbank -> spec_aug -> splice -> skip.

The reference computes features and feature-space augmentation on the
host inside DataLoader workers (/root/reference/wekws/dataset/
processor.py:134-240, init_dataset.py:24-68).  Here the host ships raw
padded waveforms and this jittable pipeline runs inside the train step:
two MXU matmuls for the fbank (frontend/features.py) plus fused VPU
elementwise work — no host feature bottleneck, no H2D feature traffic.

Stages (all static-shape, jit/vmap-friendly):
* spec_aug: per-utterance random time/freq zero-masks
  (processor.py:206-240 semantics: ``num_t_mask`` masks of length
  U[0,max_t), ``num_f_mask`` of U[0,max_f));
* context_expansion: splice [t-left .. t+right] frames along the
  feature axis, left margin clamped to frame 0, last ``right`` frames
  dropped (init_dataset.py:24-53 / processor.py:267-296 semantics);
* frame_skip: every Nth frame (processor.py:299-311).
"""

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from wekws_tpu.frontend.features import FeatureExtractor, frontend_from_dataset_conf


def spec_aug(
    rng: jax.Array,
    feats: jnp.ndarray,
    num_t_mask: int = 2,
    num_f_mask: int = 2,
    max_t: int = 50,
    max_f: int = 10,
) -> jnp.ndarray:
    """Random time/freq masking over (B, T, D), zeros as fill."""
    b, t, d = feats.shape

    def mask_axis(key, size, max_len, num_mask):
        # returns (B, size) bool keep-mask
        k1, k2 = jax.random.split(key)
        starts = jax.random.randint(k1, (b, num_mask), 0, size)
        lengths = jax.random.randint(k2, (b, num_mask), 1, max_len)
        pos = jnp.arange(size)[None, None, :]
        masked = (pos >= starts[:, :, None]) & (
            pos < (starts + lengths)[:, :, None]
        )
        return ~jnp.any(masked, axis=1)

    kt, kf = jax.random.split(rng)
    keep_t = mask_axis(kt, t, max_t, num_t_mask)  # (B, T)
    keep_f = mask_axis(kf, d, max_f, num_f_mask)  # (B, D)
    return feats * keep_t[:, :, None] * keep_f[:, None, :]


def context_expansion(
    feats: jnp.ndarray, left: int = 1, right: int = 1
) -> jnp.ndarray:
    """(B, T, D) -> (B, T - right, D * (left + 1 + right)).

    out[t] = concat(x[clamp(t-left, 0)], ..., x[t], ..., x[t+right]);
    matches the reference's replication-pad-left + drop-right-tail
    construction (processor.py:267-296)."""
    b, t, d = feats.shape
    parts = []
    for lag in range(-left, right + 1):
        idx = jnp.clip(jnp.arange(t) + lag, 0, t - 1)
        parts.append(feats[:, idx, :])
    out = jnp.concatenate(parts, axis=-1)
    return out[:, : t - right, :] if right > 0 else out


def frame_skip(feats: jnp.ndarray, skip_rate: int = 1) -> jnp.ndarray:
    if skip_rate <= 1:
        return feats
    return feats[:, ::skip_rate, :]


def context_expansion_skip(
    feats: jnp.ndarray, left: int, right: int, skip: int
) -> jnp.ndarray:
    """Fused ``frame_skip(context_expansion(x))`` without gathers.

    The unfused pair builds the splice with ``left+right+1`` clipped
    index GATHERS (a ~0.1 GB/s op class on this backend), materializes
    the full pre-skip (B, T, (l+1+r)*D) tensor (~0.8 GB at the CTC
    bench shape) and then throws 2/3 of it away in the skip — measured
    ~1.5 ms of the 3.8 ms FSMN-CTC step (PERF.md r5).  Here each lag
    contributes ONE strided time slice evaluated directly at the
    kept positions (source rows s*k + lag), plus a repeat-row-0 edge
    for the clamped first outputs — ~4x less traffic, zero gathers,
    identical output (pinned against the unfused pair in
    tests/test_data.py)."""
    b, t, d = feats.shape
    t_keep = t - right if right > 0 else t
    t_out = -(-t_keep // skip)
    parts = []
    for lag in range(-left, right + 1):
        n_clamp = max(0, -(-(-lag) // skip)) if lag < 0 else 0
        start = skip * n_clamp + lag
        sl = feats[:, start::skip, :][:, : t_out - n_clamp]
        if n_clamp:
            head = jnp.repeat(feats[:, :1, :], n_clamp, axis=1)
            sl = jnp.concatenate([head, sl], axis=1)
        if sl.shape[1] < t_out:  # tail clamp (lag > 0 at short T)
            pad = jnp.repeat(feats[:, -1:, :], t_out - sl.shape[1],
                             axis=1)
            sl = jnp.concatenate([sl, pad], axis=1)
        parts.append(sl)
    return jnp.concatenate(parts, axis=-1)


@dataclass(eq=False)  # identity hash: instances close over jit as statics
class DeviceFeaturePipeline:
    """Config-driven waveform -> model-input transform (jittable).

    Built from a wekws-style ``dataset_conf``; ``training=False``
    disables dither and spec_aug (cv/test scrubbing semantics,
    /root/reference/wekws/bin/train.py:107-111)."""

    extractor: FeatureExtractor
    spec_aug_conf: Optional[dict]
    context_left: int
    context_right: int
    skip_rate: int
    # optional device-side waveform augmentation (data/device_aug.py:
    # speed perturb + RIR reverb + noise mixing), applied before the
    # fbank when an rng is provided.  Attached after construction
    # (``pipeline.wave_aug = DeviceWaveAug.from_conf(...)``) because
    # staging the banks needs the blobstore paths and a device.
    wave_aug: Optional[object] = None

    @classmethod
    def from_conf(cls, conf: dict, training: bool = True):
        fused = bool(conf.get("fused_frontend", False))
        extractor = frontend_from_dataset_conf(conf, use_fused=fused)
        sa = None
        if training and conf.get("spec_aug", False):
            sa = dict(conf.get("spec_aug_conf", {}))
        if not training:
            import dataclasses

            extractor = FeatureExtractor(
                dataclasses.replace(extractor.cfg, dither=0.0),
                use_fused=fused,
            )
        left = right = 0
        if conf.get("context_expansion", False):
            ce = conf.get("context_expansion_conf", {})
            left, right = ce.get("left", 1), ce.get("right", 1)
        return cls(
            extractor=extractor,
            spec_aug_conf=sa,
            context_left=left,
            context_right=right,
            skip_rate=int(conf.get("frame_skip", 1)),
        )

    @property
    def output_dim(self) -> int:
        base = self.extractor.feat_dim
        if self.context_left or self.context_right:
            return base * (self.context_left + 1 + self.context_right)
        return base

    @property
    def downsample_rate(self) -> int:
        return max(self.skip_rate, 1)

    def feat_lengths(self, wave_lengths: jnp.ndarray) -> jnp.ndarray:
        n = self.extractor.num_frames(wave_lengths)
        if self.context_right:
            n = jnp.maximum(n - self.context_right, 0)
        if self.skip_rate > 1:
            n = (n + self.skip_rate - 1) // self.skip_rate
        return n

    def __call__(
        self,
        waves: jnp.ndarray,
        wave_lengths: jnp.ndarray,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(B, S) int16-scaled waves -> (B, T', D'), (B,) lengths."""
        dither_rng = aug_rng = None
        if rng is not None:
            dither_rng, aug_rng = jax.random.split(rng)
        if self.wave_aug is not None and rng is not None:
            waves, wave_lengths = self.wave_aug(
                jax.random.fold_in(rng, 0x77), waves, wave_lengths
            )
        feats, _ = self.extractor(waves, None, rng=dither_rng)
        if self.spec_aug_conf is not None and aug_rng is not None:
            feats = spec_aug(
                aug_rng,
                feats,
                num_t_mask=self.spec_aug_conf.get("num_t_mask", 2),
                num_f_mask=self.spec_aug_conf.get("num_f_mask", 2),
                max_t=self.spec_aug_conf.get("max_t", 50),
                max_f=self.spec_aug_conf.get("max_f", 10),
            )
        if (self.context_left or self.context_right) \
                and self.skip_rate > 1:
            feats = context_expansion_skip(
                feats, self.context_left, self.context_right,
                self.skip_rate,
            )
        else:
            if self.context_left or self.context_right:
                feats = context_expansion(
                    feats, self.context_left, self.context_right
                )
            feats = frame_skip(feats, self.skip_rate)
        return feats, self.feat_lengths(wave_lengths)
