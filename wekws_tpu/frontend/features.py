"""On-device (JAX) batched Kaldi-compatible feature extraction.

TPU-first design: instead of per-utterance CPU feature extraction (the
reference computes Kaldi fbank on the host inside the data loader,
/root/reference/wekws/dataset/processor.py:173-203), the input pipeline
ships raw padded int16-scaled waveforms and features are computed inside
the jitted train step.  The DFT is expressed as a matmul against a
precomputed (frame_length, 2*(fft_bins+1)) cos/sin matrix and the mel
projection as a second matmul, so the whole frontend is two MXU matmuls
plus fused elementwise VPU work — no FFT op, no host round-trips, and it
batches over (B, T) freely.

Numerics match ``wekws_tpu.frontend.kaldi`` (the numpy oracle) to float32
round-off; see tests/test_frontend.py.
"""

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wekws_tpu.frontend.kaldi import (
    EPSILON,
    FrontendConfig,
    dct_matrix,
    lifter_coeffs,
    mel_banks,
)


def _dft_matrix(frame_length: int, padded_size: int) -> np.ndarray:
    """Real-input DFT as a matmul: (frame_length, 2 * (padded/2 + 1)).

    Only the first ``frame_length`` rows of the padded frame are nonzero,
    so the matrix contracts the un-padded frame directly.  Columns are
    [cos | -sin] halves for the one-sided spectrum.
    """
    n = np.arange(frame_length, dtype=np.float64)[:, None]
    k = np.arange(padded_size // 2 + 1, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / padded_size
    return np.concatenate([np.cos(ang), -np.sin(ang)], axis=1)


def frame_waveform(
    waves: jnp.ndarray, frame_length: int, frame_shift: int
) -> jnp.ndarray:
    """Strided framing of (B, S) -> (B, T, frame_length), snip_edges.

    Implemented as a reshape into shift-sized chunks plus a handful of
    static slices (frame starts are multiples of ``frame_shift``), which
    XLA lowers to cheap slices instead of a gather.
    """
    b, s = waves.shape
    num_frames = 1 + (s - frame_length) // frame_shift if s >= frame_length else 0
    if num_frames <= 0:
        return jnp.zeros((b, 0, frame_length), waves.dtype)
    k = math.ceil(frame_length / frame_shift)
    # Pad so chunk t + k - 1 exists for the last frame.
    needed = (num_frames - 1 + k) * frame_shift
    if needed > s:
        waves = jnp.pad(waves, ((0, 0), (0, needed - s)))
    else:
        waves = waves[:, :needed]
    chunks = waves.reshape(b, -1, frame_shift)
    parts = []
    for j in range(k):
        take = min(frame_shift, frame_length - j * frame_shift)
        parts.append(chunks[:, j : j + num_frames, :take])
    return jnp.concatenate(parts, axis=-1)


class FeatureExtractor:
    """Batched on-device fbank/MFCC with Kaldi semantics.

    Usage::

        fe = FeatureExtractor(cfg)
        feats, feat_lengths = fe(waves, wave_lengths, rng)

    ``waves`` is (B, S) float32 in int16 scale (i.e. wave * 2**15 for
    [-1, 1) input, matching the reference's training convention).
    Frames past ``feat_lengths`` contain garbage and must be masked
    downstream (losses and classifiers here all take lengths).
    """

    def __init__(self, cfg: FrontendConfig, use_fused: bool = False):
        if cfg.feature_type not in ("fbank", "mfcc"):
            raise ValueError(f"unknown feature_type {cfg.feature_type}")
        if not cfg.snip_edges:
            raise NotImplementedError("only snip_edges=True is supported")
        self.cfg = cfg
        n = cfg.padded_window_size
        # Fold the whole per-frame linear chain — DC removal, preemphasis,
        # window, DFT — into ONE (frame_length, 2*(nfft/2+1)) matrix,
        # precomputed in float64.  Each stage is linear in the frame
        # vector: DC removal is (I - J/L), preemphasis is bidiagonal with
        # the Kaldi first-sample convention (x0 -= coeff*x0), windowing is
        # diagonal.  One matmul replaces a mean-subtract, a shift-subtract
        # and a multiply over the (B, T, frame_length) frames buffer —
        # measured 0.9 ms/step saved at B=512 on v5e (PERF.md round 2).
        L = cfg.frame_length
        analysis = _dft_matrix(L, n)  # (L, 2*(n/2+1)) float64
        analysis = np.asarray(cfg.window(), np.float64)[:, None] * analysis
        if cfg.preemphasis != 0.0:
            p = np.eye(L)
            p[0, 0] = 1.0 - cfg.preemphasis
            p[np.arange(0, L - 1), np.arange(1, L)] = -cfg.preemphasis
            analysis = p @ analysis
        if cfg.remove_dc_offset:
            analysis = analysis - np.mean(analysis, axis=0, keepdims=True)
        self._analysis = jnp.asarray(analysis, jnp.float32)
        # Opt-in fused Pallas frontend (ops/fused_frontend.py): same
        # operators and precision, spectrum/power/dither kept in VMEM.
        # Measured SLOWER than this XLA path on v5e (PERF.md round 2)
        # — off by default; enable per-pipeline via dataset_conf
        # ``fused_frontend: true`` to re-evaluate (non-TPU backends
        # silently fall back).  Set at construction: the extractor is
        # closed over jit as an identity-hashed static, so mutating
        # the flag after a trace would NOT retrace.
        self.use_fused = use_fused
        bank = mel_banks(
            cfg.num_mel_bins, n, cfg.sample_rate, cfg.low_freq, cfg.high_freq
        )
        self._mel_t = jnp.asarray(bank.T, jnp.float32)  # (bins+1, M)
        if cfg.feature_type == "mfcc":
            dct = dct_matrix(cfg.num_ceps, cfg.num_mel_bins)
            if cfg.cepstral_lifter != 0.0:
                dct = dct * lifter_coeffs(cfg.num_ceps, cfg.cepstral_lifter)[None, :]
            self._dct = jnp.asarray(dct, jnp.float32)
        else:
            self._dct = None

    @property
    def feat_dim(self) -> int:
        return self.cfg.feat_dim

    def num_frames(self, num_samples):
        cfg = self.cfg
        return jnp.where(
            num_samples >= cfg.frame_length,
            1 + (num_samples - cfg.frame_length) // cfg.frame_shift,
            0,
        )

    def _fused_call(self, waves, dither_rng):
        """Pallas fused path (ops/fused_frontend.py); None = fall back."""
        from wekws_tpu.ops.fused_frontend import fused_fbank

        cfg = self.cfg
        dither = cfg.dither if dither_rng is not None else 0.0
        seed = None
        if dither:
            seed = jax.random.bits(dither_rng, (), "uint32").astype(
                jnp.int32
            )
        return fused_fbank(
            waves,
            self._analysis,
            self._mel_t,
            self._dct,
            frame_length=cfg.frame_length,
            frame_shift=cfg.frame_shift,
            dither=float(dither),
            seed=seed,
            use_power=cfg.use_power,
            use_log=cfg.use_log_fbank,
            epsilon=EPSILON,
        )

    def __call__(
        self,
        waves: jnp.ndarray,
        lengths: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        cfg = self.cfg
        waves = waves.astype(jnp.float32)
        frame_dither = (
            cfg.dither != 0.0 and rng is not None
            and cfg.dither_mode == "frame"
        )
        if cfg.dither != 0.0 and rng is not None \
                and cfg.dither_mode == "wave":
            waves = waves + cfg.dither * jax.random.normal(
                rng, waves.shape, jnp.float32
            )

        if self.use_fused:
            mel = self._fused_call(waves, rng if frame_dither else None)
            if mel is not None:
                lengths_out = (
                    None if lengths is None else self.num_frames(lengths)
                )
                return mel, lengths_out

        # Frontend numerics are the training/runtime contract. HIGH
        # (bf16_3x) keeps the DFT/mel matmuls at ~1e-5 relative error;
        # default (single-pass bf16) loses ~2e-3, and HIGHEST triggers
        # a pathological minutes-long XLA compile on TPU for these
        # shapes (measured: 320s vs 1.2s) with no accuracy need.
        hi = (jax.lax.Precision.DEFAULT if self.cfg.precision == "default"
              else jax.lax.Precision.HIGH)
        # DC removal + preemphasis + window + DFT in one matmul (see
        # __init__: the chain is linear and folded into self._analysis).
        # (A strided-conv-on-the-wave formulation was measured SLOWER
        # than frames+matmul on v5e — XLA materializes the patches
        # either way; PERF.md round 2.)
        frames = frame_waveform(waves, cfg.frame_length, cfg.frame_shift)
        if frame_dither:
            frames = frames + cfg.dither * jax.random.normal(
                rng, frames.shape, jnp.float32
            )
        spec = jnp.matmul(
            frames,
            self._analysis,
            precision=hi,
            preferred_element_type=jnp.float32,
        )
        nbin = self._analysis.shape[1] // 2
        power = spec[..., :nbin] ** 2 + spec[..., nbin:] ** 2
        if not cfg.use_power:
            power = jnp.sqrt(power)
        mel = jnp.matmul(
            power, self._mel_t, precision=hi, preferred_element_type=jnp.float32
        )
        if cfg.use_log_fbank:
            mel = jnp.log(jnp.maximum(mel, EPSILON))
        if self._dct is not None:
            mel = jnp.matmul(
                mel, self._dct, precision=hi, preferred_element_type=jnp.float32
            )
        feat_lengths = None if lengths is None else self.num_frames(lengths)
        return mel, feat_lengths


def frontend_from_dataset_conf(
    conf: dict, use_fused: bool = False
) -> FeatureExtractor:
    """Build a FeatureExtractor from a wekws-style ``dataset_conf`` dict.

    Supports both config schemas of the reference: the legacy
    ``feature_extraction_conf`` (with ``feature_type``) and the new
    ``feats_type`` + ``fbank_conf``/``mfcc_conf`` layout.
    """
    if "feature_extraction_conf" in conf:
        fc = conf["feature_extraction_conf"]
        ftype = fc.get("feature_type", "fbank")
    else:
        ftype = conf.get("feats_type", "fbank")
        fc = conf.get(f"{ftype}_conf", {})
    resample = conf.get("resample_conf", {}).get("resample_rate", 16000)
    cfg = FrontendConfig(
        feature_type=ftype,
        sample_rate=resample,
        num_mel_bins=fc.get("num_mel_bins", 40),
        num_ceps=fc.get("num_ceps", fc.get("num_mel_bins", 40)),
        frame_length_ms=fc.get("frame_length", 25),
        frame_shift_ms=fc.get("frame_shift", 10),
        dither=fc.get("dither", 0.0),
        dither_mode=fc.get("dither_mode", "frame"),
        precision=fc.get("precision", "high"),
    )
    return FeatureExtractor(cfg, use_fused=use_fused)
