"""Device-side waveform augmentation: speed perturb, RIR reverb,
additive noise — the whole chain inside the jitted train step.

The host pipeline (data/processor.py: speed_perturb -> add_reverb ->
add_noise, reference semantics from
/root/reference/wekws/dataset/processor.py:358-430) costs ~1/2.0k
core-seconds per audio-second and caps delivered training at ~21k
audio-s/s on a 4-core host (PERF.md r4) — 8x below the device rate.
This module stages the noise/RIR banks in HBM ONCE and applies the
same math batched on device, so augmented corpora can train through
the device-resident epoch path at device rate with zero steady-state
host work.

Math parity with the host stages (pinned in tests/test_device_aug.py):

* speed_perturb: sox 'speed' via linear interpolation —
  ``out[i] = interp(i * speed)`` clamped at the last valid sample,
  new length = floor(len / speed) (data/audio.py:58-76).  Per-row
  speed drawn uniformly from {0.9, 1.0, 1.1}.
* add_reverb: linear convolution with an L2-normalized RIR, truncated
  to the input length (processor.py:126-157) — here a four-step
  matmul DFT (MatmulFFT: jnp.fft is unimplemented on this TPU
  runtime, and a DFT is MXU matmuls anyway) at a fixed n >= S + R - 1
  with the RIR spectra precomputed at staging (exact linear conv for
  any such n).
* add_noise: additive noise at an SNR drawn from the per-prefix range
  ({noise: (0,15), speech: (5,30), music: (5,15)}), random crop when
  the noise is longer than the utterance, tile-from-0 (np.resize)
  when shorter; powers are means over the valid samples with the
  reference's +1e-4 floor (processor.py:163-188).  NOTE the floor is
  scale-dependent: the host mixes [-1, 1) waves, so banks staged from
  int16-scale sources are normalized back to [-1, 1) here and the mix
  is rescaled after.

Randomness: one fold_in'd key per stage per step; picks are uniform
over the bank (the host's per-epoch store shuffle has no device
analog — the bank is small and picks are iid, which is statistically
equivalent for augmentation).
"""

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_SNR_RANGES = {"noise": (0.0, 15.0), "speech": (5.0, 30.0),
               "music": (5.0, 15.0)}
_DEFAULT_SNR = (0.0, 15.0)
_INT16 = float(1 << 15)


def speed_perturb_batch(
    rng: jax.Array,
    waves: jnp.ndarray,
    lengths: jnp.ndarray,
    speeds: Tuple[float, ...] = (0.9, 1.0, 1.1),
    out_len: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, S) -> (B, S_out) with per-row random playback speed."""
    b, s = waves.shape
    if out_len is None:
        out_len = int(np.ceil(s / min(speeds)))
    speed = jnp.asarray(speeds, jnp.float32)[
        jax.random.randint(rng, (b,), 0, len(speeds))
    ]
    new_len = (lengths.astype(jnp.float32) / speed).astype(jnp.int32)
    pos = jnp.arange(out_len, dtype=jnp.float32)[None, :] * speed[:, None]
    # np.interp clamps positions past the last sample
    pos = jnp.minimum(pos, (lengths - 1).astype(jnp.float32)[:, None])
    i0 = jnp.floor(pos).astype(jnp.int32)
    frac = pos - i0
    g0 = jnp.take_along_axis(waves, jnp.clip(i0, 0, s - 1), axis=1)
    g1 = jnp.take_along_axis(waves, jnp.clip(i0 + 1, 0, s - 1), axis=1)
    out = g0 * (1.0 - frac) + g1 * frac
    mask = jnp.arange(out_len)[None, :] < new_len[:, None]
    return out * mask, new_len


class MatmulFFT:
    """Two-factor (four-step Cooley-Tukey) DFT as MXU matmuls.

    ``jnp.fft`` is UNIMPLEMENTED on some TPU runtimes (measured on
    this one: the compiled FftOp aborts at execute), and the MXU has
    no FFT unit anyway — on TPU a DFT *is* matmuls.  For n = a*b with
    n index n = b*n1 + n2 and k = k1 + a*k2:

        X[k] = sum_{n2} W_n^{n2*k1} W_b^{n2*k2} sum_{n1} x[n] W_a^{n1*k1}

    i.e. a (a x a) matmul over the n1 axis, an (a, b) twiddle, and a
    (b x b) matmul over n2 — O(n*(a+b)) instead of O(n^2), all in
    batched 100-300-wide matmuls the MXU likes.  Complex arithmetic is
    spelled out in real/imag pairs (complex matmul support is as
    spotty as FFT).  Matmul precision 'high' (bf16_3x) keeps ~1e-5
    relative error — augmentation-grade."""

    def __init__(self, a: int, b: int):
        self.a, self.b, self.n = a, b, a * b
        k1 = np.arange(a)
        n1 = np.arange(a)
        wa = np.exp(-2j * np.pi * np.outer(k1, n1) / a)
        k2 = np.arange(b)
        n2 = np.arange(b)
        wb = np.exp(-2j * np.pi * np.outer(n2, k2) / b)
        tw = np.exp(-2j * np.pi * np.outer(k1, n2) / self.n)  # (a, b)
        self.wa_re = jnp.asarray(wa.real, jnp.float32)
        self.wa_im = jnp.asarray(wa.imag, jnp.float32)
        self.wb_re = jnp.asarray(wb.real, jnp.float32)
        self.wb_im = jnp.asarray(wb.imag, jnp.float32)
        self.tw_re = jnp.asarray(tw.real, jnp.float32)
        self.tw_im = jnp.asarray(tw.imag, jnp.float32)

    def _stages(self, xre, xim, wa_re, wa_im, wb_re, wb_im,
                tw_re, tw_im):
        hp = jax.lax.Precision.HIGH
        bsz = xre.shape[0]
        x2re = xre.reshape(bsz, self.a, self.b)
        x2im = xim.reshape(bsz, self.a, self.b)
        # DFT over n1 (axis 1): T[k1, n2]
        def m(w, x):
            return jnp.einsum("ij,bjk->bik", w, x, precision=hp)

        tre = m(wa_re, x2re) - m(wa_im, x2im)
        tim = m(wa_re, x2im) + m(wa_im, x2re)
        # twiddle
        tre, tim = (tre * tw_re - tim * tw_im,
                    tre * tw_im + tim * tw_re)
        # DFT over n2 (axis 2): X[k1, k2]
        def m2(x, w):
            return jnp.einsum("bik,kl->bil", x, w, precision=hp)

        ore = m2(tre, wb_re) - m2(tim, wb_im)
        oim = m2(tre, wb_im) + m2(tim, wb_re)
        # k = k1 + a*k2 -> k2-major flatten
        ore = ore.transpose(0, 2, 1).reshape(bsz, self.n)
        oim = oim.transpose(0, 2, 1).reshape(bsz, self.n)
        return ore, oim

    def fft(self, xre, xim):
        return self._stages(xre, xim, self.wa_re, self.wa_im,
                            self.wb_re, self.wb_im,
                            self.tw_re, self.tw_im)

    def ifft(self, xre, xim):
        # ifft(X) = conj(fft(conj(X))) / n
        re, im = self.fft(xre, -xim)
        return re / self.n, -im / self.n

    @classmethod
    def for_length(cls, min_n: int) -> "MatmulFFT":
        """Pick a = 256, b = ceil(min_n / 256): n is a multiple of 256
        just past the needed length (linear-conv padding absorbs the
        excess)."""
        a = 256
        return cls(a, -(-min_n // a))


def reverb_batch(
    rng: jax.Array,
    waves: jnp.ndarray,
    lengths: jnp.ndarray,
    fft: MatmulFFT,
    rir_re: jnp.ndarray,  # (R, n) full DFT of L2-normalized RIRs
    rir_im: jnp.ndarray,
    prob: float,
) -> jnp.ndarray:
    """Convolve each row with a random RIR with probability ``prob``
    (linear convolution via the matmul DFT, truncated to the input)."""
    b, s = waves.shape
    k1, k2 = jax.random.split(rng)
    pick = jax.random.randint(k1, (b,), 0, rir_re.shape[0])
    pad = jnp.zeros((b, fft.n - s), waves.dtype)
    wre, wim = fft.fft(jnp.concatenate([waves, pad], axis=1),
                       jnp.zeros((b, fft.n), jnp.float32))
    rre, rim = rir_re[pick], rir_im[pick]
    pre = wre * rre - wim * rim
    pim = wre * rim + wim * rre
    out, _ = fft.ifft(pre, pim)
    out = out[:, :s]
    apply = (jax.random.uniform(k2, (b,)) < prob)[:, None]
    mask = jnp.arange(s)[None, :] < lengths[:, None]
    return jnp.where(apply, out.astype(waves.dtype) * mask, waves)


def mix_noise_batch(
    rng: jax.Array,
    waves: jnp.ndarray,
    lengths: jnp.ndarray,
    noise_bank: jnp.ndarray,     # (N, Sn) float32 in the WAVES' scale
    noise_lengths: jnp.ndarray,  # (N,)
    snr_lo: jnp.ndarray,         # (N,) per-noise-key SNR range
    snr_hi: jnp.ndarray,
    prob: float,
    power_scale: float = 1.0,
) -> jnp.ndarray:
    """Additive noise at a per-prefix-range SNR with probability
    ``prob``.  ``power_scale`` converts the waves' scale to the scale
    the reference computes powers in (1/2^15 for int16-scale waves:
    the +1e-4 power floor is calibrated for [-1, 1) audio)."""
    b, s = waves.shape
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    pick = jax.random.randint(k1, (b,), 0, noise_bank.shape[0])
    nlen = noise_lengths[pick]
    longer = nlen >= lengths
    max_start = jnp.clip(nlen - lengths, 0, None)
    start = (jax.random.uniform(k2, (b,))
             * (max_start + 1).astype(jnp.float32)).astype(jnp.int32)
    start = jnp.minimum(start, max_start)
    cols = jnp.arange(s)[None, :]
    idx = jnp.where(
        longer[:, None],
        jnp.minimum(start[:, None] + cols, noise_bank.shape[1] - 1),
        cols % jnp.maximum(nlen, 1)[:, None],  # np.resize tiling
    )
    noise = jnp.take_along_axis(noise_bank[pick], idx, axis=1)
    mask = (cols < lengths[:, None]).astype(jnp.float32)
    n_valid = jnp.maximum(lengths.astype(jnp.float32), 1.0)
    ps = jnp.float32(power_scale) ** 2
    audio_pow = jnp.sum(waves * waves * mask, axis=1) / n_valid * ps
    noise_pow = jnp.sum(noise * noise * mask, axis=1) / n_valid * ps
    audio_db = 10.0 * jnp.log10(audio_pow + 1e-4)
    noise_db = 10.0 * jnp.log10(noise_pow + 1e-4)
    snr = jax.random.uniform(
        k3, (b,), minval=0.0, maxval=1.0
    ) * (snr_hi[pick] - snr_lo[pick]) + snr_lo[pick]
    scale = jnp.sqrt(10.0 ** ((audio_db - noise_db - snr) / 10.0))
    apply = jax.random.uniform(k4, (b,)) < prob
    return waves + jnp.where(apply, scale, 0.0)[:, None] * noise * mask


@dataclasses.dataclass(eq=False)  # identity hash: closes over jit
class DeviceWaveAug:
    """Staged banks + probabilities; jittable
    ``(rng, waves, lengths) -> (waves, lengths)`` applying the host
    chain's order: speed_perturb -> reverb -> noise."""

    speed_perturb: bool
    speeds: Tuple[float, ...]
    fft: Optional[MatmulFFT]
    rir_re: Optional[jnp.ndarray]
    rir_im: Optional[jnp.ndarray]
    reverb_prob: float
    noise_bank: Optional[jnp.ndarray]
    noise_lengths: Optional[jnp.ndarray]
    snr_lo: Optional[jnp.ndarray]
    snr_hi: Optional[jnp.ndarray]
    noise_prob: float
    power_scale: float

    def __call__(self, rng, waves, lengths):
        waves = waves.astype(jnp.float32)
        if self.speed_perturb:
            waves, lengths = speed_perturb_batch(
                jax.random.fold_in(rng, 1), waves, lengths, self.speeds
            )
        if self.rir_re is not None and self.reverb_prob > 0:
            waves = reverb_batch(
                jax.random.fold_in(rng, 2), waves, lengths,
                self.fft, self.rir_re, self.rir_im, self.reverb_prob,
            )
        if self.noise_bank is not None and self.noise_prob > 0:
            waves = mix_noise_batch(
                jax.random.fold_in(rng, 3), waves, lengths,
                self.noise_bank, self.noise_lengths,
                self.snr_lo, self.snr_hi, self.noise_prob,
                self.power_scale,
            )
        return waves, lengths

    @classmethod
    def from_conf(cls, conf: dict, max_wave_samples: int,
                  wave_scale: float = _INT16, data_dir: str = "."):
        """Build from a wekws dataset_conf (keys: speed_perturb,
        noise_source/noise_prob, reverb_source/reverb_prob) by staging
        the blobstore banks on device.  ``max_wave_samples`` bounds the
        post-speed-perturb buffer (sets the reverb DFT length);
        ``wave_scale`` is the waves' amplitude scale (int16 by
        default — the resident corpus convention)."""
        import os

        from wekws_tpu.data import audio
        from wekws_tpu.data.blobstore import open_store

        def _resolve(p):
            return p if os.path.isabs(p) else os.path.join(data_dir, p)

        speeds = (0.9, 1.0, 1.1)
        out_len = int(np.ceil(max_wave_samples / min(speeds))) \
            if conf.get("speed_perturb", False) else max_wave_samples

        fft = rir_re = rir_im = None
        if conf.get("reverb_prob", 0) > 0 and conf.get("reverb_source"):
            store = open_store(_resolve(conf["reverb_source"]), seed=0)
            rirs = []
            for i in range(len(store)):
                _, blob = store.get(i)
                rir, _ = audio.read_wav(blob)
                norm = float(np.sqrt(np.sum(rir.astype(np.float64) ** 2)))
                if norm > 0:
                    rirs.append(rir / norm)
            if rirs:
                rmax = max(len(r) for r in rirs)
                fft = MatmulFFT.for_length(out_len + rmax - 1)
                spec = np.stack([
                    np.fft.fft(r, fft.n) for r in rirs
                ])
                rir_re = jnp.asarray(spec.real.astype(np.float32))
                rir_im = jnp.asarray(spec.imag.astype(np.float32))

        noise_bank = noise_lengths = snr_lo = snr_hi = None
        if conf.get("noise_prob", 0) > 0 and conf.get("noise_source"):
            store = open_store(_resolve(conf["noise_source"]), seed=0)
            waves, lens, los, his = [], [], [], []
            for i in range(len(store)):
                key, blob = store.get(i)
                w, _ = audio.read_wav(blob)
                prefix = str(key).split("/")[-1].split("_")[0]
                lo, hi = _SNR_RANGES.get(prefix, _DEFAULT_SNR)
                waves.append(w)
                lens.append(len(w))
                los.append(lo)
                his.append(hi)
            if waves:
                smax = max(lens)
                bank = np.zeros((len(waves), smax), np.float32)
                for i, w in enumerate(waves):
                    # blobstore wavs are [-1, 1); banks live in the
                    # TRAINING waves' scale so mixing is consistent
                    bank[i, : len(w)] = w * wave_scale
                noise_bank = jnp.asarray(bank)
                noise_lengths = jnp.asarray(lens, jnp.int32)
                snr_lo = jnp.asarray(los, jnp.float32)
                snr_hi = jnp.asarray(his, jnp.float32)

        return cls(
            speed_perturb=bool(conf.get("speed_perturb", False)),
            speeds=speeds,
            fft=fft,
            rir_re=rir_re,
            rir_im=rir_im,
            reverb_prob=float(conf.get("reverb_prob", 0.0)),
            noise_bank=noise_bank,
            noise_lengths=noise_lengths,
            snr_lo=snr_lo,
            snr_hi=snr_hi,
            noise_prob=float(conf.get("noise_prob", 0.0)),
            power_scale=1.0 / wave_scale,
        )
