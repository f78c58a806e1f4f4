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

EVERYTHING IS MATMULS/CONVS, STRIDED SLICES AND ELEMENTWISE — no
gathers, no transposes.  The first draft used take_along_axis /
fancy-indexed row picks / a flatten-transpose in the DFT; measured on
the real chip, those gathers ran at ~100-250 MB/s (three orders of
magnitude below HBM) and one augmented step cost 834 ms vs 6 ms for
the whole train step.  The TPU-native formulations, as evolved
through the r4/r5 device traces (PERF.md 'Device-side augmentation'
sections — the full chain went 44.6k -> 80.4k delivered audio-s/s
over round 5):

* speed perturb -> one strided NWC ``conv_general_dilated`` per speed
  (window = the (p+2, q) polyphase interpolation matrix, stride p) —
  no framing buffers; speeds are assigned per CONTIGUOUS ROW GROUP
  (speed_perturb_group) so each group resamples only its own speed,
  with the epoch shuffle supplying the randomness (per-row iid draws
  remain available as speed_perturb_batch);
* noise/RIR pick -> ONE-HOT MATMUL: onehot(pick) @ bank rides the
  MXU; noise crop variants are pre-tiled into bank ROWS so the row
  pick covers clip AND crop; banks zero-pad to >= 512 rows (small-K
  picks run ~1 GB/s on this backend, K=512 at MXU rate);
* DFT -> four-step Cooley-Tukey in a FIXED (a, b) matrix layout for
  both directions (forward emits [k1, k2], the inverse consumes it;
  factors chosen lane-aligned so reshapes are free), on the HERMITIAN
  HALF grid for the real-signal pipeline (rfft_mat/irfft_mat_real:
  mirror rows fold into 2x inverse weights — exact, ~40% less work);
* reverb -> full-utterance DFT by default; OVERLAP-SAVE on a ~2x-RIR
  block grid available (reverb_block_dft) — measured slower here
  (block framing passes outweigh the smaller pick) but wins when
  utterances are long relative to the RIR on bandwidth-healthy
  backends;
* precision "default" (1-pass bf16 matmuls, f32 accumulation) and
  bf16 banks/DFT intermediates: ~0.4% relative waveform error —
  inaudible under augmentation, error-bounded in tests and
  convergence-gated A/B vs the host chain (PERF.md r5).

Math parity with the host stages (pinned in tests/test_device_aug.py):

* speed_perturb: sox 'speed' via linear interpolation, new length =
  floor(len * q / p) — EXACT integers on host and device alike
  (data/audio.py speed_perturb; pinned over a 4000-length sweep);
  polyphase positions are exact rationals vs the host's f64 float
  positions (<= 1e-11-sample drift over a 2 s utterance).
* add_reverb: linear convolution with an L2-normalized RIR truncated
  to the input length (processor.py:126-157), exact for any DFT
  length n >= S + R - 1.
* add_noise: SNR drawn from the per-prefix range ({noise: (0,15),
  speech: (5,30), music: (5,15)}); powers are means over the valid
  samples with the reference's +1e-4 floor computed at the [-1, 1)
  scale it was calibrated for (processor.py:163-188).

Randomness: one fold_in'd key per stage per step; picks are uniform
over the bank (the host's per-epoch store shuffle has no device
analog — picks are iid, statistically equivalent for augmentation).
"""

import dataclasses
from fractions import Fraction
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_INT16 = float(1 << 15)

# Matmul precision for the DFT stages and the one-hot bank picks.
# "default" = single-pass bf16 (f32 accumulation): ~2^-9 relative
# error — augmentation-grade, and 3x fewer MXU passes than "high"
# (bf16_3x).  Parity tests pin the math at "high"/"highest"; the
# production chain runs "default" (convergence-gated, PERF.md r5).
_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def _prec(p):
    return _PRECISIONS[p] if isinstance(p, str) else p


# ---------------------------------------------------------------------------
# speed perturb: polyphase resampling
# ---------------------------------------------------------------------------


def _polyphase_matrix(speed: float):
    """(p, q, M (W, q) f32): q output samples per p input samples,
    out[q*k + r] = sum_w M[w, r] * x[p*k + w] — linear interpolation
    at the exact rational phases."""
    frac = Fraction(speed).limit_denominator(100)
    p, q = frac.numerator, frac.denominator
    w = p + 2  # base_r + 1 <= p - 1 + 1; +1 margin
    m = np.zeros((w, q), np.float32)
    for r in range(q):
        base, rem = divmod(p * r, q)
        f = rem / q
        m[base, r] = 1.0 - f
        m[base + 1, r] = f
    return p, q, m


def _resample_one(waves: jnp.ndarray, p: int, q: int,
                  m: np.ndarray, out_len: int,
                  method: str = "conv") -> jnp.ndarray:
    """Polyphase resample (B, S) -> (B, out_len) at speed p/q.

    ``conv`` (default): ONE ``lax.conv_general_dilated`` in NWC layout
    with window = the (p+2, q) interpolation matrix and stride p — the
    framing never materializes, so the whole stage is a single op
    (the r4 ``matmul`` framing spent ~3 ms/step in pad/reshape/concat
    layout copies at the flagship shape — measured r5 device trace).

    ``matmul``: frames[b, k, j] = x[b, p*k + j] for j < p is exactly
    ``x.reshape(B, blocks, p)``; the two overflow taps (j = p, p+1)
    are the next block's first two columns — a contiguous block-axis
    slice.  (The obvious ``x[:, j::p]`` lane-strided slices relayout
    at ~0.3 GB/s on this backend.)"""
    b = waves.shape[0]
    blocks = -(-out_len // q)
    if method == "conv":
        need = p * blocks + 2
        if waves.shape[1] < need:
            waves = jnp.pad(waves, ((0, 0), (0, need - waves.shape[1])))
        out = jax.lax.conv_general_dilated(
            waves[:, :need, None],            # (B, S', 1)  NWC
            jnp.asarray(m)[:, None, :],       # (p+2, 1, q) WIO
            window_strides=(p,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(b, blocks * q)
        return out[:, :out_len]
    need = p * (blocks + 1)
    if waves.shape[1] < need:
        waves = jnp.pad(waves, ((0, 0), (0, need - waves.shape[1])))
    r = waves[:, :need].reshape(b, blocks + 1, p)
    head = r[:, :blocks, :]          # (B, blocks, p): taps 0..p-1
    nxt = r[:, 1:, :2]               # (B, blocks, 2): taps p, p+1
    frames = jnp.concatenate([head, nxt], axis=2)
    out = jnp.einsum(
        "bkw,wq->bkq", frames, jnp.asarray(m),
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(b, blocks * q)
    return out[:, :out_len]


def speed_perturb_group(
    waves: jnp.ndarray,
    lengths: jnp.ndarray,
    speeds: Tuple[float, ...] = (0.9, 1.0, 1.1),
    out_len: Optional[int] = None,
    method: str = "conv",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, S) -> (B, S_out): speed assigned by CONTIGUOUS ROW GROUP
    (rows [0, B/k) get speeds[0], ...) instead of per-row draws.

    Each group resamples ONLY its own speed — 3x less polyphase work
    and zero select passes vs the per-row version, which must compute
    every candidate for every row and blend with wheres (measured
    ~2.8 ms of the r5 flagship aug step).  Documented statistical
    deviation from the reference's per-sample iid draw
    (processor.py:106-131): within one step the speed counts are fixed
    (floor/ceil of B/k) and a sample's speed is determined by its slot
    — but the epoch shuffle re-randomizes slots every epoch, so the
    per-sample marginal over epochs is uniform over ``speeds``, like
    the reference.  Convergence-gated A/B vs the host chain
    (PERF.md r5)."""
    b, s = waves.shape
    k = len(speeds)
    if out_len is None:
        out_len = int(np.ceil(s / min(speeds)))
    base, rem = divmod(b, k)
    outs, lens = [], []
    start = 0
    for i, sp in enumerate(speeds):
        g = base + (1 if i < rem else 0)
        seg = waves[start:start + g].astype(jnp.float32)
        seglen = lengths[start:start + g]
        if sp == 1.0:
            cand = seg if s >= out_len else jnp.pad(
                seg, ((0, 0), (0, out_len - s)))
            cand = cand[:, :out_len]
            nl = seglen
        else:
            p, q, m = _polyphase_matrix(sp)
            cand = _resample_one(seg, p, q, m, out_len, method)
            frac = Fraction(sp).limit_denominator(100)
            nl = seglen * frac.denominator // frac.numerator
        mask = jnp.arange(out_len)[None, :] < nl[:, None]
        outs.append(cand * mask)
        lens.append(nl.astype(jnp.int32))
        start += g
    return jnp.concatenate(outs, axis=0), jnp.concatenate(lens)


def speed_perturb_batch(
    rng: jax.Array,
    waves: jnp.ndarray,
    lengths: jnp.ndarray,
    speeds: Tuple[float, ...] = (0.9, 1.0, 1.1),
    out_len: Optional[int] = None,
    method: str = "conv",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, S) -> (B, S_out) with per-row random playback speed: each
    rational speed is resampled by polyphase matmul and the row's
    variant selected — no per-element gather."""
    b, s = waves.shape
    if out_len is None:
        out_len = int(np.ceil(s / min(speeds)))
    choice = jax.random.randint(rng, (b,), 0, len(speeds))
    # exact integer lengths: floor(len * q / p) per rational speed p/q
    # (f32 division can be off by one near exact multiples); matches
    # the host's audio.speed_perturb exactly.
    new_len = lengths
    for i, sp in enumerate(speeds):
        frac = Fraction(sp).limit_denominator(100)
        cl = lengths * frac.denominator // frac.numerator
        new_len = jnp.where(choice == i, cl, new_len)
    new_len = new_len.astype(jnp.int32)
    cands = []
    for sp in speeds:
        if sp == 1.0:
            cand = waves if s >= out_len else jnp.pad(
                waves, ((0, 0), (0, out_len - s)))
            cands.append(cand[:, :out_len].astype(jnp.float32))
        else:
            p, q, m = _polyphase_matrix(sp)
            cands.append(_resample_one(
                waves.astype(jnp.float32), p, q, m, out_len, method))
    out = cands[0]
    for i in range(1, len(speeds)):
        out = jnp.where((choice == i)[:, None], cands[i], out)
    mask = jnp.arange(out_len)[None, :] < new_len[:, None]
    return out * mask, new_len


# ---------------------------------------------------------------------------
# matmul DFT (transpose-free matrix layout)
# ---------------------------------------------------------------------------


class MatmulFFT:
    """Two-factor (four-step Cooley-Tukey) DFT as MXU matmuls, in a
    FIXED (a, b) matrix layout for both directions.

    ``jnp.fft`` is UNIMPLEMENTED on this TPU runtime (the compiled
    FftOp aborts at execute — measured), and the MXU has no FFT unit
    anyway: on TPU a DFT *is* matmuls.  For n = a*b, time index
    n = b*n1 + n2 and frequency index k = k1 + a*k2:

        X[k1, k2] = sum_{n2} W_n^{n2 k1} W_b^{n2 k2}
                    sum_{n1} x[n1, n2] W_a^{n1 k1}

    ``fft_mat`` maps the natural reshape x.reshape(a, b) [n1, n2] to
    the spectrum matrix [k1, k2]; ``ifft_mat`` inverts it back — the
    flat frequency order is never materialized, so the convolution
    pipeline (forward -> pointwise product -> inverse) contains zero
    transposes.  Complex arithmetic is spelled out in real/imag pairs
    (complex matmul support is as spotty as FFT).  Matmul precision is
    per-instance: 'high' (bf16_3x) keeps ~1e-5 relative error (parity
    tests); 'default' (1-pass bf16) keeps ~2e-3 — augmentation-grade
    at 3x fewer MXU passes, the production setting.
    """

    def __init__(self, a: int, b: int, precision: str = "high",
                 dtype: str = "float32"):
        self.a, self.b, self.n = a, b, a * b
        self.precision = _prec(precision)
        self.dtype = jnp.dtype(dtype)
        wa = np.exp(-2j * np.pi * np.outer(np.arange(a), np.arange(a)) / a)
        wb = np.exp(-2j * np.pi * np.outer(np.arange(b), np.arange(b)) / b)
        tw = np.exp(-2j * np.pi
                    * np.outer(np.arange(a), np.arange(b)) / self.n)

        def dev(x):
            return jnp.asarray(x, self.dtype)

        self.wa_re, self.wa_im = dev(wa.real), dev(wa.imag)
        self.wb_re, self.wb_im = dev(wb.real), dev(wb.imag)
        self.tw_re, self.tw_im = dev(tw.real), dev(tw.imag)
        self.twT_re, self.twT_im = dev(tw.real.T), dev(tw.imag.T)
        # conjugates for the inverse; identity for the MXU transpose
        self.wac_re, self.wac_im = dev(wa.real.T), dev(-wa.imag.T)
        self.wbc_re, self.wbc_im = dev(wb.real), dev(-wb.imag)
        self.eye_b = dev(np.eye(b))
        # -- Hermitian (real-input) half spectrum ------------------------
        # A real signal's spectrum satisfies X[n-k] = conj(X[k]); in the
        # (k1, k2) layout the mirror of row k1 is row a-k1 (with the k2
        # axis reversed), so rows k1 in [0, a/2] carry the whole
        # spectrum.  ``ah`` keeps a/2+1 rows rounded UP to a multiple of
        # 64 (lane-tiling: a ragged kept-row dim would turn every
        # reshape into a layout copy); the surplus rows carry zero
        # inverse weight.  Mirror-row contributions in the inverse
        # reduce to 2*Re(term) (derivation: t[a-k1, n2] =
        # W_b^{n2} conj(t[k1, n2]) and the trailing factor cancels
        # against the twiddle), so the inverse is EXACT — halving is a
        # symmetry, not an approximation.
        if a % 2 == 0:
            ah_min = a // 2 + 1
            self.ah = min(a, 64 * (-(-ah_min // 64)))
            # Hermitian inverse weights: row 0 and the Nyquist row a/2
            # count once, interior kept rows twice (their mirrors are
            # dropped), surplus lane-padding rows zero.  The same rule
            # holds when ah == a because spectrum_mat_half zeroes the
            # mirror rows of the staged banks.
            wgt = np.zeros((self.ah,), np.float64)
            wgt[0] = 1.0
            wgt[1:a // 2] = 2.0
            wgt[a // 2] = 1.0
            self.wah_re = dev(wa.real[:, :self.ah])
            self.wah_im = dev(wa.imag[:, :self.ah])
            self.twTh_re = dev(tw.real.T[:, :self.ah])
            self.twTh_im = dev(tw.imag.T[:, :self.ah])
            self.twh_re = dev(tw.real[:self.ah])
            self.twh_im = dev(tw.imag[:self.ah])
            self.wach_re = dev(wa.real.T[:self.ah] * wgt[:, None])
            self.wach_im = dev(-wa.imag.T[:self.ah] * wgt[:, None])
        else:
            self.ah = None

    @property
    def nh(self) -> int:
        """Flattened half-spectrum width (ah * b)."""
        return self.ah * self.b

    def _swap(self, xre, xim, wre, wim, imag: bool = True):
        """Contract dim 1 of (B, u, v) against (u, u') -> (B, v, u').

        lax.dot_general with the batch and the free v folded into the
        M side of the MXU — the einsum formulation ("ij,bjk->bik")
        lets XLA put the small matrix on M and the batch on N, which
        this backend executes at ~0.3 TFLOP/s (PERF.md r4).  The
        output's swapped (v, u') layout is part of the pipeline
        design, not an accident."""
        dims = (((1,), (0,)), ((), ()))
        hp = self.precision

        def dg(x, w):
            return jax.lax.dot_general(x, w, dims, precision=hp)

        ore = dg(xre, wre) - (dg(xim, wim) if xim is not None else 0.0)
        if not imag:
            return ore, None
        oim = dg(xre, wim) + (dg(xim, wre) if xim is not None else 0.0)
        return ore, oim

    def _minor(self, xre, xim, wre, wim):
        """Contract the minor dim of (B, u, v) against (v, v') ->
        (B, u, v') — layout-preserving, M = B*u."""
        hp = self.precision

        def m(x, w):
            return jnp.einsum("buv,vw->buw", x, w, precision=hp)

        return (m(xre, wre) - m(xim, wim), m(xre, wim) + m(xim, wre))

    def fft_mat(self, xre, xim=None):
        """(B, a, b) [n1, n2] -> (B, a, b) [k1, k2].

        Two swap-stages: contract n1 -> (B, n2, k1), twiddle, contract
        n2 -> (B, k1, k2).  ``xim=None`` marks a real input (saves two
        dot_generals in the first stage)."""
        tre, tim = self._swap(xre, xim, self.wa_re, self.wa_im)
        tre, tim = (tre * self.twT_re - tim * self.twT_im,
                    tre * self.twT_im + tim * self.twT_re)
        return self._swap(tre, tim, self.wb_re, self.wb_im)

    def ifft_mat_real(self, xre, xim):
        """(B, a, b) [k1, k2] -> (B, a, b) [n1, n2], REAL part only
        (the convolution consumer).  Minor-contract over k2 (layout
        preserving), twiddle, swap-contract over k1 -> (B, n2, n1),
        then one more swap against the identity — an MXU-executed
        transpose (XLA's transpose op runs at ~6 GB/s here)."""
        tre, tim = self._minor(xre, xim, self.wbc_re, self.wbc_im)
        # conjugate twiddle W_N^{+k1 n2}
        tre, tim = (tre * self.tw_re + tim * self.tw_im,
                    tim * self.tw_re - tre * self.tw_im)
        # real part of the k1 contraction only
        ore, _ = self._swap(tre, None, self.wac_re, None, imag=False)
        oim, _ = self._swap(tim, None, self.wac_im, None, imag=False)
        z = (ore - oim) / self.n          # (B, n2, n1)
        out, _ = self._swap(z, None, self.eye_b, None, imag=False)
        return out                        # (B, n1, n2)

    def rfft_mat(self, x):
        """Real input (B, a, b) [n1, n2] -> HALF spectrum
        (B, ah, b) [k1, k2], rows k1 >= a/2+1 unspecified (zero
        inverse weight)."""
        tre, tim = self._swap(x, None, self.wah_re, self.wah_im)
        tre, tim = (tre * self.twTh_re - tim * self.twTh_im,
                    tre * self.twTh_im + tim * self.twTh_re)
        return self._swap(tre, tim, self.wb_re, self.wb_im)

    def irfft_mat_real(self, xre, xim):
        """(B, ah, b) HALF spectrum -> (B, a, b) real [n1, n2] —
        exact for Hermitian data: the dropped mirror rows contribute
        the conjugate of the kept rows, folded in as the 2x weights
        baked into ``wach``."""
        tre, tim = self._minor(xre, xim, self.wbc_re, self.wbc_im)
        tre, tim = (tre * self.twh_re + tim * self.twh_im,
                    tim * self.twh_re - tre * self.twh_im)
        ore, _ = self._swap(tre, None, self.wach_re, None, imag=False)
        oim, _ = self._swap(tim, None, self.wach_im, None, imag=False)
        z = (ore - oim) / self.n          # (B, n2, n1)
        out, _ = self._swap(z, None, self.eye_b, None, imag=False)
        return out                        # (B, n1, n2)

    def spectrum_mat(self, x: np.ndarray) -> np.ndarray:
        """Host-side: np.fft.fft(x, n) rearranged to the [k1, k2]
        matrix layout (k = k1 + a*k2 -> reshape (b, a), swap axes)."""
        flat = np.fft.fft(x, self.n, axis=-1)
        return np.swapaxes(
            flat.reshape(x.shape[:-1] + (self.b, self.a)), -1, -2)

    def spectrum_mat_half(self, x: np.ndarray) -> np.ndarray:
        """Host-side half-spectrum bank rows: spectrum_mat truncated to
        the kept ``ah`` k1 rows, surplus rows zeroed (so they multiply
        the forward's unspecified rows to zero in the pointwise
        product)."""
        full = self.spectrum_mat(x)
        half = np.zeros(x.shape[:-1] + (self.ah, self.b), np.complex64)
        keep = min(self.ah, self.a // 2 + 1)
        half[..., :keep, :] = full[..., :keep, :]
        return half

    @classmethod
    def for_length(cls, min_n: int, precision: str = "high",
                   dtype: str = "float32") -> "MatmulFFT":
        """Smallest n = a*b >= min_n, preferring LANE-ALIGNED factors
        (both multiples of 128) when that costs <= 25% extra length:
        a non-128-multiple minor dim makes every (B, a, b) reshape in
        the pipeline a real layout copy on TPU (measured r5: the
        256x155 grid spent ~1 ms/step in reshape/pad copies at the
        flagship shape; 320x128 removes them).  Falls back to
        a=256 x ceil(min_n/256) for short grids (tests, short
        utterances) where alignment would balloon n."""
        best = None
        for a in (256, 320, 384, 512):
            b = 128 * -(-min_n // (a * 128))
            if best is None or a * b < best[0] * best[1]:
                best = (a, b)
        unaligned = (256, -(-min_n // 256))
        if best[0] * best[1] <= 1.25 * unaligned[0] * unaligned[1]:
            return cls(best[0], best[1], precision, dtype)
        return cls(unaligned[0], unaligned[1], precision, dtype)

    @classmethod
    def for_block(cls, rir_len: int, target: int = 8192,
                  precision: str = "high",
                  dtype: str = "float32") -> "MatmulFFT":
        """Block DFT for overlap-save convolution with an
        ``rir_len``-tap filter: n = max(target, 2*rir_len) rounded up
        to a power of two (so the (a, b) factors stay MXU-friendly),
        guaranteeing usable block length L = n - rir_len + 1 >= rir_len
        — each block's history fits in the single previous block.
        Factors split as evenly as powers of two allow (a >= b)."""
        n = 1
        while n < max(target, 2 * rir_len):
            n *= 2
        a = 1
        while a * a < n:
            a *= 2
        return cls(a, n // a, precision, dtype)


def reverb_batch(
    rng: jax.Array,
    waves: jnp.ndarray,
    lengths: jnp.ndarray,
    fft: MatmulFFT,
    rir_re: jnp.ndarray,  # (Rpad, ah*b) HALF-spectrum rows, zero-padded
    rir_im: jnp.ndarray,
    n_rirs: int,
    prob: float,
) -> jnp.ndarray:
    """Convolve each row with a random RIR with probability ``prob``
    (linear convolution via the matmul DFT, truncated to the input).
    The per-row pick is a one-hot matmul over the ZERO-PADDED bank:
    Rpad >= 512 keeps the contraction dimension out of this backend's
    small-K matmul pathology (a K=50 pick ran at ~1 GB/s, K=512 at
    MXU rate — PERF.md r4).  Banks and the whole transform pipeline
    live on the HERMITIAN HALF grid (real input => mirror rows are
    conjugates): ~40% less DFT/pick/pointwise work, exactly
    (MatmulFFT.rfft_mat / irfft_mat_real; bank rows from
    spectrum_mat_half).

    (A prob==0.5 even/odd row partition that halves the DFT work was
    measured NEUTRAL in-chain — the interleave extract + re-stack
    passes cost what the skipped transforms saved — and was reverted
    to keep per-row semantics; PERF.md r5.)"""
    b, s = waves.shape
    k1, k2 = jax.random.split(rng)
    assert rir_re.shape[1] == fft.nh, (rir_re.shape, fft.nh)
    mask = jnp.arange(s)[None, :] < lengths[:, None]
    if prob >= 1.0:
        out = _reverb_rows(k1, waves, fft, rir_re, rir_im, n_rirs)
        return out.astype(waves.dtype) * mask
    out = _reverb_rows(k1, waves, fft, rir_re, rir_im, n_rirs)
    apply = (jax.random.uniform(k2, (b,)) < prob)[:, None]
    return jnp.where(apply, out.astype(waves.dtype) * mask, waves)


def _reverb_rows(rng, waves, fft, rir_re, rir_im, n_rirs):
    """DFT-convolve EVERY row with a per-row random RIR pick (no
    probability logic, no masking)."""
    b, s = waves.shape
    rpad = rir_re.shape[0]
    pick = jax.random.randint(rng, (b,), 0, n_rirs)
    onehot = jax.nn.one_hot(pick, rpad, dtype=fft.dtype)
    hp = fft.precision
    rre = jnp.einsum("xr,rs->xs", onehot, rir_re.astype(fft.dtype),
                     precision=hp).reshape(b, fft.ah, fft.b)
    rim = jnp.einsum("xr,rs->xs", onehot, rir_im.astype(fft.dtype),
                     precision=hp).reshape(b, fft.ah, fft.b)
    pad = jnp.zeros((b, fft.n - s), fft.dtype)
    x = jnp.concatenate(
        [waves.astype(fft.dtype), pad], axis=1
    ).reshape(b, fft.a, fft.b)
    wre, wim = fft.rfft_mat(x)
    pre = wre * rre - wim * rim
    pim = wre * rim + wim * rre
    return fft.irfft_mat_real(pre, pim).reshape(b, fft.n)[:, :s]


def reverb_batch_blocked(
    rng: jax.Array,
    waves: jnp.ndarray,
    lengths: jnp.ndarray,
    fft: MatmulFFT,
    rir_re: jnp.ndarray,  # (Rpad, n_blk) spectra on the BLOCK grid
    rir_im: jnp.ndarray,
    n_rirs: int,
    prob: float,
    rir_len: int,
) -> jnp.ndarray:
    """Overlap-save convolution: same math as ``reverb_batch`` but on
    a fixed BLOCK DFT of length n_blk = fft.n ~ 2*rir_len instead of
    one full-utterance DFT.

    Why: the full-length spectra bank is (Rpad, S+R) wide, so the
    per-row one-hot pick alone costs B x Rpad x (S+R) MACs — at the
    flagship shape that was ~40% of the whole augmentation chain
    (PERF.md r5).  On the block grid the picked spectrum is rir_len-
    scale instead of utterance-scale: the pick shrinks ~5x and the
    bank ~5x in HBM, while the DFT work stays the same (FFT cost per
    sample is ~(a+b), and blocking trades a smaller transform for the
    R-1-sample overlap between blocks).

    Layout: blocks of L = n_blk - rir_len + 1 fresh samples each carry
    the previous block's rir_len-1 tail (classic overlap-save; block
    framing is a reshape + one static tail slice — no gathers), the
    circular-conv wraparound corrupts exactly the first rir_len-1
    outputs of each block, and the kept L-sample windows tile the
    output back via one reshape."""
    b, s = waves.shape
    n_blk, r = fft.n, rir_len
    l_use = n_blk - (r - 1)
    nb = -(-s // l_use)
    assert nb == 1 or l_use >= r - 1, (
        f"block {n_blk} too short for rir_len {r}: history spans "
        "more than one previous block"
    )
    assert rir_re.shape[1] == fft.nh, (rir_re.shape, fft.nh)
    k1, k2 = jax.random.split(rng)
    rpad = rir_re.shape[0]
    pick = jax.random.randint(k1, (b,), 0, n_rirs)
    onehot = jax.nn.one_hot(pick, rpad, dtype=fft.dtype)
    hp = fft.precision
    rre = jnp.einsum("xr,rs->xs", onehot, rir_re.astype(fft.dtype),
                     precision=hp).reshape(b, 1, fft.ah, fft.b)
    rim = jnp.einsum("xr,rs->xs", onehot, rir_im.astype(fft.dtype),
                     precision=hp).reshape(b, 1, fft.ah, fft.b)
    x = waves.astype(fft.dtype)
    if nb * l_use > s:
        x = jnp.pad(x, ((0, 0), (0, nb * l_use - s)))
    x = x.reshape(b, nb, l_use)
    # history: last r-1 samples of the previous block (zeros before
    # block 0) — a static minor-dim slice, not a gather
    zeros = jnp.zeros((b, 1, r - 1), fft.dtype)
    if nb > 1:
        hist = jnp.concatenate(
            [zeros, x[:, :-1, l_use - (r - 1):]], axis=1)
    else:
        hist = zeros
    blocks = jnp.concatenate([hist, x], axis=2)  # (b, nb, n_blk)
    xm = blocks.reshape(b * nb, fft.a, fft.b)
    wre, wim = fft.rfft_mat(xm)
    wre = wre.reshape(b, nb, fft.ah, fft.b)
    wim = wim.reshape(b, nb, fft.ah, fft.b)
    pre = (wre * rre - wim * rim).reshape(b * nb, fft.ah, fft.b)
    pim = (wre * rim + wim * rre).reshape(b * nb, fft.ah, fft.b)
    y = fft.irfft_mat_real(pre, pim).reshape(b, nb, n_blk)
    out = y[:, :, r - 1:].reshape(b, nb * l_use)[:, :s]
    apply = (jax.random.uniform(k2, (b,)) < prob)[:, None]
    mask = jnp.arange(s)[None, :] < lengths[:, None]
    return jnp.where(apply, out.astype(waves.dtype) * mask, waves)


# ---------------------------------------------------------------------------
# additive noise
# ---------------------------------------------------------------------------


def mix_noise_batch(
    rng: jax.Array,
    waves: jnp.ndarray,
    lengths: jnp.ndarray,
    noise_rows: jnp.ndarray,  # (Npad, >= S): pre-tiled crop variants
    snr_lo: jnp.ndarray,      # (Npad,) per-row SNR range
    snr_hi: jnp.ndarray,
    n_rows: int,
    prob: float,
    power_scale: float = 1.0,
    precision: str = "high",
) -> jnp.ndarray:
    """Additive noise at a per-prefix-range SNR with probability
    ``prob``.  The bank rows are staged PRE-TILED at several crop
    offsets (np.resize semantics per offset), so the random pick over
    rows covers noise choice AND crop — no dynamic_slice (a lane-dim
    dynamic_slice runs at ~0.3 GB/s here) and no gather; the pick is
    a one-hot matmul over the zero-padded (K >= 512) bank.
    ``power_scale`` converts the waves' scale to the [-1, 1) scale
    the reference's +1e-4 power floor is calibrated for."""
    b, s = waves.shape
    k1, k3, k4 = jax.random.split(rng, 3)
    npad = noise_rows.shape[0]
    pick = jax.random.randint(k1, (b,), 0, n_rows)
    onehot = jax.nn.one_hot(pick, npad, dtype=jnp.float32)
    noise = jnp.einsum("bn,ns->bs", onehot.astype(noise_rows.dtype),
                       noise_rows[:, :s],
                       precision=_prec(precision)).astype(jnp.float32)
    cols = jnp.arange(s)[None, :]
    mask = (cols < lengths[:, None]).astype(jnp.float32)
    n_valid = jnp.maximum(lengths.astype(jnp.float32), 1.0)
    ps = jnp.float32(power_scale) ** 2
    waves_f = waves.astype(jnp.float32)
    audio_pow = jnp.sum(waves_f * waves_f * mask, axis=1) / n_valid * ps
    noise_pow = jnp.sum(noise * noise * mask, axis=1) / n_valid * ps
    audio_db = 10.0 * jnp.log10(audio_pow + 1e-4)
    noise_db = 10.0 * jnp.log10(noise_pow + 1e-4)
    snr = jax.random.uniform(k3, (b,)) * jnp.einsum(
        "bn,n->b", onehot, snr_hi - snr_lo) + jnp.einsum(
        "bn,n->b", onehot, snr_lo)
    scale = jnp.sqrt(10.0 ** ((audio_db - noise_db - snr) / 10.0))
    apply = jax.random.uniform(k4, (b,)) < prob
    return waves + jnp.where(apply, scale, 0.0)[:, None] * noise * mask


# ---------------------------------------------------------------------------
# staged-bank container
# ---------------------------------------------------------------------------


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
    n_rirs: int
    reverb_prob: float
    noise_rows: Optional[jnp.ndarray]
    snr_lo: Optional[jnp.ndarray]
    snr_hi: Optional[jnp.ndarray]
    n_noise_rows: int
    noise_prob: float
    power_scale: float
    # rir_len > 0: spectra live on the BLOCK grid (fft.n ~ 2*rir_len)
    # and reverb runs overlap-save; 0: full-utterance DFT (legacy).
    rir_len: int = 0
    # matmul precision for the bank picks (the DFT precision is baked
    # into ``fft``): "default" = 1-pass bf16, the production setting.
    precision: str = "default"
    # "conv" (one strided NWC conv) or "matmul" (framing + einsum)
    speed_method: str = "conv"
    # True: contiguous-group speed assignment (3x less work; the epoch
    # shuffle supplies the randomness — see speed_perturb_group);
    # False: per-row iid draws (the r4 behavior).
    speed_partition: bool = True

    def __call__(self, rng, waves, lengths):
        waves = waves.astype(jnp.float32)
        if self.speed_perturb:
            if self.speed_partition and waves.shape[0] >= len(self.speeds):
                waves, lengths = speed_perturb_group(
                    waves, lengths, self.speeds,
                    method=self.speed_method,
                )
            else:
                waves, lengths = speed_perturb_batch(
                    jax.random.fold_in(rng, 1), waves, lengths,
                    self.speeds, method=self.speed_method,
                )
        if self.rir_re is not None and self.reverb_prob > 0:
            if self.rir_len > 0:
                waves = reverb_batch_blocked(
                    jax.random.fold_in(rng, 2), waves, lengths,
                    self.fft, self.rir_re, self.rir_im, self.n_rirs,
                    self.reverb_prob, self.rir_len,
                )
            else:
                waves = reverb_batch(
                    jax.random.fold_in(rng, 2), waves, lengths,
                    self.fft, self.rir_re, self.rir_im, self.n_rirs,
                    self.reverb_prob,
                )
        if self.noise_rows is not None and self.noise_prob > 0:
            waves = mix_noise_batch(
                jax.random.fold_in(rng, 3), waves, lengths,
                self.noise_rows, self.snr_lo, self.snr_hi,
                self.n_noise_rows, self.noise_prob, self.power_scale,
                precision=self.precision,
            )
        return waves, lengths

    @classmethod
    def from_conf(cls, conf: dict, max_wave_samples: int,
                  wave_scale: float = _INT16, data_dir: str = ".",
                  crop_variants: int = 8, pad_rows: int = 512,
                  precision: Optional[str] = None,
                  dtype: Optional[str] = None):
        """Build from a wekws dataset_conf (keys: speed_perturb,
        noise_source/noise_prob, reverb_source/reverb_prob) by staging
        the blobstore banks on device.  ``max_wave_samples`` bounds the
        post-speed-perturb buffer (sets the noise row width); RIR
        spectra are staged on a BLOCK DFT grid (~2x the longest RIR)
        for overlap-save convolution; each noise clip is staged at
        ``crop_variants`` evenly-spaced circular crop offsets (the
        per-row random pick then covers noise AND crop); banks are
        zero-padded to >= ``pad_rows`` rows so the pick matmuls stay
        out of the backend's small-K pathology.  ``precision`` (also
        conf key "device_aug_precision") sets the DFT/pick matmul
        precision — "default" (1-pass bf16) is the production setting,
        convergence-gated vs the host chain (PERF.md r5)."""
        import os

        from wekws_tpu.data import audio
        from wekws_tpu.data.blobstore import open_store
        from wekws_tpu.data.processor import snr_range_for_key

        def _resolve(p):
            return p if os.path.isabs(p) else os.path.join(data_dir, p)

        if precision is None:
            precision = conf.get("device_aug_precision", "default")
        if dtype is None:
            # bf16 banks/DFT intermediates: halves the chain's HBM
            # traffic; ~0.4% relative waveform error, convergence-gated
            # A/B vs the host chain (PERF.md r5).  Override with
            # conf key device_aug_dtype: float32.
            dtype = conf.get("device_aug_dtype", "bfloat16")
        speeds = (0.9, 1.0, 1.1)
        out_len = int(np.ceil(max_wave_samples / min(speeds))) \
            if conf.get("speed_perturb", False) else max_wave_samples

        fft = rir_re = rir_im = None
        n_rirs = 0
        rmax = 0
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
                # Full-utterance DFT is the measured default on this
                # backend: overlap-save shrinks the spectra pick ~5x
                # but its block framing adds elementwise passes over
                # the (B, nb, n_blk) buffers that cost more than the
                # pick saves (in-chain: 49.3k vs 37.6k audio-s/s,
                # PERF.md r5).  conf key "reverb_block_dft": true
                # opts into overlap-save (wins when RIRs are short
                # relative to utterances AND elementwise bandwidth is
                # healthy).
                full_n = out_len + rmax - 1
                fft = MatmulFFT.for_block(rmax, precision=precision,
                                          dtype=dtype)
                if (not conf.get("reverb_block_dft", False)
                        or fft.n >= -(-full_n // 256) * 256):
                    fft = MatmulFFT.for_length(full_n,
                                               precision=precision,
                                               dtype=dtype)
                    rmax = 0  # rir_len=0 -> full-length path
                n_rirs = len(rirs)
                rpad = max(pad_rows, n_rirs)
                spec = np.zeros((rpad, fft.nh), np.complex64)
                for i, r in enumerate(rirs):
                    spec[i] = fft.spectrum_mat_half(
                        np.asarray(r)).reshape(-1)
                rir_re = jnp.asarray(spec.real, dtype)
                rir_im = jnp.asarray(spec.imag, dtype)

        noise_rows = snr_lo = snr_hi = None
        n_noise_rows = 0
        if conf.get("noise_prob", 0) > 0 and conf.get("noise_source"):
            store = open_store(_resolve(conf["noise_source"]), seed=0)
            rows, los, his = [], [], []
            for i in range(len(store)):
                key, blob = store.get(i)
                w, _ = audio.read_wav(blob)
                if not len(w):
                    continue
                lo, hi = snr_range_for_key(key)
                # crop_variants circular offsets of the np.resize
                # tiling, all in the waves' scale
                for v in range(crop_variants):
                    off = (v * len(w)) // crop_variants
                    rows.append(np.resize(
                        np.roll(w, -off), (out_len,)) * wave_scale)
                    los.append(lo)
                    his.append(hi)
            if rows:
                n_noise_rows = len(rows)
                npad = max(pad_rows, n_noise_rows)
                bank = np.zeros((npad, out_len), np.float32)
                bank[:n_noise_rows] = np.stack(rows)
                noise_rows = jnp.asarray(bank, dtype)
                snr_lo = jnp.asarray(
                    np.pad(np.asarray(los, np.float32),
                           (0, npad - n_noise_rows)))
                snr_hi = jnp.asarray(
                    np.pad(np.asarray(his, np.float32),
                           (0, npad - n_noise_rows)))

        return cls(
            speed_perturb=bool(conf.get("speed_perturb", False)),
            speeds=speeds,
            fft=fft,
            rir_re=rir_re,
            rir_im=rir_im,
            n_rirs=n_rirs,
            reverb_prob=float(conf.get("reverb_prob", 0.0)),
            noise_rows=noise_rows,
            snr_lo=snr_lo,
            snr_hi=snr_hi,
            n_noise_rows=n_noise_rows,
            noise_prob=float(conf.get("noise_prob", 0.0)),
            power_scale=1.0 / wave_scale,
            rir_len=rmax,
            precision=precision,
        )

    # -- argument threading --------------------------------------------
    # The banks are far too large to ride into jit as closure
    # constants (the tunneled compiler rejects >~100 MB programs with
    # HTTP 413, and constants bloat any backend's compile).  The
    # resident train step passes them as ARGUMENTS instead:
    # ``leaves()`` extracts the array dict to pass through jit, and
    # ``bind(leaves)`` rebuilds an instance around the traced arrays
    # at trace time (data/resident.py make_resident_steps).

    ARRAY_FIELDS = ("rir_re", "rir_im", "noise_rows", "snr_lo",
                    "snr_hi")

    def leaves(self):
        return {k: getattr(self, k) for k in self.ARRAY_FIELDS
                if getattr(self, k) is not None}

    def bind(self, leaves):
        return dataclasses.replace(self, **leaves)
