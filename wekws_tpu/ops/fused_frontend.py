"""Fused Pallas fbank/MFCC frontend kernel (opt-in, experimental).

The XLA feature path (frontend/features.py) materializes, per
B=512 x 2 s step, the dither noise buffer (B, T, 400), the complex
spectrum (B, T, 514) and the power spectrum (B, T, 257) in HBM —
several hundred MB of round-trip traffic on top of the DFT/mel
matmuls.  This kernel keeps the whole post-framing chain in VMEM:
each grid step reads one row-block of framed wave and writes finished
log-mel (or MFCC) rows; dither noise, spectrum and power never exist
in HBM.  Framing itself stays in XLA (``frame_waveform``'s static
slices; doing the overlapping-frame assembly in-kernel was measured
SLOWER due to Mosaic relayouts).

**Measured result (v5e, B=512 x 2 s, PERF.md round 2): this kernel
LOSES to the XLA path** — 4.4 ms vs 2.4 ms (no dither), 5.3 ms vs
3.2 ms (dither) — across three kernel designs (slab loop with
in-kernel framing, lane-concat frame assembly, row-blocked
post-framing fusion).  XLA's fusion of the folded-matmul formulation
is already near its roofline here and the Mosaic versions pay
relayout/small-tile costs the estimate missed.  The kernel stays
available behind ``dataset_conf: fused_frontend: true`` (off by
default) as a validated starting point for other shape regimes or
hardware generations; parity and in-kernel dither distribution are
tested on chip (tools/bench_fused_frontend.py).

Numerics are the same contract as the XLA path:

* the identical precomputed analysis operators (the per-frame linear
  chain folded into one matrix, features.py:95-113), split into re/im
  halves so the power spectrum needs no lane-axis slicing;
* matmuls run the same bf16_3x (HIGH) decomposition the XLA path
  requests, spelled out manually (Mosaic's named precisions are only
  DEFAULT and HIGHEST) with f32 accumulation;
* dither adds iid N(0,1)*dither per frame sample (Kaldi frame-mode
  semantics, reference processor.py:173-203) — generated in-kernel
  from the TPU PRNG via Box-Muller instead of a jax.random.normal
  HBM buffer.  Distribution-identical, different stream.

The kernel has no backward: features are data, no gradient flows
into the frontend.
"""

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_SUBLANE = 8


def _interpret_forced() -> bool:
    """True inside ``pltpu.force_tpu_interpret_mode()`` (CPU tests)."""
    try:
        from jax._src import config as jax_config

        return (
            jax_config.pallas_tpu_interpret_mode_context_manager.value
            is not None
        )
    except Exception:
        return False


def _normal(shape):
    """iid N(0,1) from the seeded TPU PRNG (Box-Muller).

    Uses both outputs of the transform (r*cos, r*sin) so each
    log/sqrt/cos/sin quad yields TWO samples; requires an even lane
    dim."""
    rows, n = shape
    assert n % 2 == 0, n
    half = (rows, n // 2)
    # bitcast to uint32: random bits come back as int32 and an
    # arithmetic >> of a negative value would leave the sign bit set
    b1 = pltpu.bitcast(pltpu.prng_random_bits(half), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(half), jnp.uint32)
    # top 24 bits -> [0, 1); u1 in (0, 1] so log() is finite.  The
    # shifted values fit in 24 bits, so bitcast to int32 before the
    # float cast (Mosaic has no uint32->f32 cast).
    f1 = pltpu.bitcast(b1 >> 8, jnp.int32).astype(jnp.float32)
    f2 = pltpu.bitcast(b2 >> 8, jnp.int32).astype(jnp.float32)
    u1 = 1.0 - f1 * (1.0 / (1 << 24))
    u2 = (2.0 * np.pi) * f2 * (1.0 / (1 << 24))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return jnp.concatenate([r * jnp.cos(u2), r * jnp.sin(u2)], axis=-1)


def _split(m):
    h = m.astype(jnp.bfloat16)
    return h, (m - h.astype(jnp.float32)).astype(jnp.bfloat16)


def _dot3(a_hi, a_lo, b_hi, b_lo):
    """bf16_3x matmul — the HIGH-precision decomposition the XLA path
    requests (features.py): a*b ~ hi(a)hi(b) + hi(a)lo(b) +
    lo(a)hi(b), each pass at bf16 MXU rate with f32 accumulation."""
    f32 = jnp.float32
    return (
        jnp.dot(a_hi, b_hi, preferred_element_type=f32)
        + jnp.dot(a_hi, b_lo, preferred_element_type=f32)
        + jnp.dot(a_lo, b_hi, preferred_element_type=f32)
    )


def _fbank_kernel(
    seed_ref,
    frames_ref,
    are_hi_ref,
    are_lo_ref,
    aim_hi_ref,
    aim_lo_ref,
    mel_hi_ref,
    mel_lo_ref,
    dct_hi_ref,
    dct_lo_ref,
    out_ref,
    *,
    dither: float,
    use_power: bool,
    use_log: bool,
    has_dct: bool,
    epsilon: float,
):
    # weight operands arrive pre-split into bf16 hi/lo halves (they
    # are grid-invariant; splitting in-kernel would redo the casts
    # every grid step)
    if dither > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    frames = frames_ref[:]
    if dither > 0.0:
        frames = frames + dither * _normal(frames.shape)
    f_hi, f_lo = _split(frames)
    sre = _dot3(f_hi, f_lo, are_hi_ref[:], are_lo_ref[:])
    sim = _dot3(f_hi, f_lo, aim_hi_ref[:], aim_lo_ref[:])
    power = sre * sre + sim * sim
    if not use_power:
        power = jnp.sqrt(power)
    mel = _dot3(*_split(power), mel_hi_ref[:], mel_lo_ref[:])
    if use_log:
        mel = jnp.log(jnp.maximum(mel, epsilon))
    if has_dct:
        mel = _dot3(*_split(mel), dct_hi_ref[:], dct_lo_ref[:])
    out_ref[:] = mel


def _roundup(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _vmem_estimate(
    br: int, frame_length: int, nbin: int, mel_dim: int
) -> int:
    """Rough per-step VMEM bytes (lane padding included)."""
    fl_p = _roundup(frame_length, _LANE)
    nbin_p = _roundup(nbin, _LANE)
    mel_p = _roundup(mel_dim, _LANE)
    frames = br * fl_p * (4 + 2 + 2 + 4)  # f32 + hi/lo + dither draws
    spec = 2 * br * nbin_p * 4  # sre + sim
    power = br * nbin_p * (4 + 2 + 2)
    out = br * mel_p * 4
    fl8 = _roundup(frame_length, _SUBLANE)
    # weights live in VMEM as pre-split bf16 hi/lo halves only
    weights = 2 * fl8 * nbin_p * (2 + 2) + nbin_p * mel_p * (2 + 2)
    return frames + spec + power + out + weights


def _pick_block_rows(rows, frame_length, nbin, mel_dim, vmem_budget):
    """Largest row-block fitting the budget.  A divisor of ``rows``
    (no padded tail block) is preferred only if it is at least half
    the largest fitting block — a small divisor multiplies the grid
    step count, which costs more than a <=1-block pad."""
    cands = [c for c in (1024, 512, 256, 128, 64) if c <= rows]
    fitting = [
        c for c in cands
        if _vmem_estimate(c, frame_length, nbin, mel_dim) <= vmem_budget
    ]
    if not fitting:
        return None
    for c in fitting:
        if rows % c == 0 and 2 * c >= fitting[0]:
            return c
    return fitting[0]


def fused_fbank(
    waves: jnp.ndarray,
    analysis: jnp.ndarray,
    mel_t: jnp.ndarray,
    dct_t: Optional[jnp.ndarray],
    *,
    frame_length: int,
    frame_shift: int,
    dither: float = 0.0,
    seed: Optional[jnp.ndarray] = None,
    use_power: bool = True,
    use_log: bool = True,
    epsilon: float = 1.1921e-07,
    vmem_budget: int = 20 * 1024 * 1024,
) -> Optional[jnp.ndarray]:
    """(B, S) f32 waves -> (B, T, D) features, or None if ineligible.

    ``analysis`` is the folded (frame_length, 2*nbin) re|im DFT
    operator (features.py), ``mel_t`` the (nbin, M) mel bank,
    ``dct_t`` the optional (M, C) DCT for MFCC.  ``seed`` is a scalar
    int32 consumed only when ``dither > 0``.
    """
    from wekws_tpu.frontend.features import frame_waveform

    # TPU-only primitives (Mosaic grid spec, in-kernel PRNG): on any
    # other backend return None so the caller's XLA path runs —
    # unless interpret mode is forced (the CPU test path).
    platform = jax.devices()[0].platform
    if platform not in ("tpu", "axon") and not _interpret_forced():
        return None

    b, s = waves.shape
    if s < frame_length:
        return None
    if dither > 0.0 and frame_length % 2:
        return None  # in-kernel Box-Muller draws samples in pairs
    t = 1 + (s - frame_length) // frame_shift
    rows = b * t
    nbin = analysis.shape[1] // 2
    mel_dim = mel_t.shape[1] if dct_t is None else dct_t.shape[1]
    br = _pick_block_rows(
        rows, frame_length, nbin, mel_t.shape[1], vmem_budget
    )
    if br is None:
        return None

    frames = frame_waveform(waves, frame_length, frame_shift).reshape(
        rows, frame_length
    )
    rows_pad = _roundup(rows, br)
    if rows_pad != rows:
        frames = jnp.pad(frames, ((0, rows_pad - rows), (0, 0)))

    if dct_t is None:
        # dummy 2-D operand keeps one kernel signature; never read
        dct_in = jnp.zeros((8, 128), jnp.float32)
    else:
        dct_in = dct_t
    if seed is None:
        seed = jnp.zeros((), jnp.int32)
    seed = jnp.reshape(seed.astype(jnp.int32), (1,))

    def split(m):
        h = m.astype(jnp.bfloat16)
        return h, (m - h.astype(jnp.float32)).astype(jnp.bfloat16)

    # grid-invariant weights: bf16_3x hi/lo halves computed ONCE here
    # (in-kernel splits would redo the casts every grid step)
    weights = (
        *split(analysis[:, :nbin]),   # are hi/lo
        *split(analysis[:, nbin:]),   # aim hi/lo
        *split(mel_t),                # mel hi/lo
        *split(dct_in),               # dct hi/lo
    )

    kernel = functools.partial(
        _fbank_kernel,
        dither=float(dither),
        use_power=use_power,
        use_log=use_log,
        has_dct=dct_t is not None,
        epsilon=epsilon,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows_pad, mel_dim), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(rows_pad // br,),
            in_specs=[
                pl.BlockSpec(
                    (br, frame_length), lambda i, s_ref: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ] + [
                pl.BlockSpec(
                    w.shape, lambda i, s_ref: (0, 0),
                    memory_space=pltpu.VMEM,
                )
                for w in weights
            ],
            out_specs=pl.BlockSpec(
                (br, mel_dim), lambda i, s_ref: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=2 * vmem_budget + 8 * 1024 * 1024,
        ),
    )(seed, frames, *weights)
    return out[:rows].reshape(b, t, mel_dim)
