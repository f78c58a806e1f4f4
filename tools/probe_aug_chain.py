"""Device-aug chain probe: per-variant and per-stage cost of the
waveform augmentation chain (data/device_aug.py) at the flagship
bench shape (B=512, 2 s utterances, 20x4000-tap RIRs, 400 noise
rows).

Run on the real chip to choose the production configuration:

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_aug_chain.py

Variants: {full-utterance DFT, overlap-save block DFT} x {precision
high (bf16_3x, r4 setting), default (1-pass bf16, r5 setting)},
plus per-stage isolation (speed / reverb / noise) for the winner.

Timing method (PERF.md r4 'Timing-method audit'): every timed loop
carries a data dependence (accumulated output + per-iter rng) and
ends with a host fetch — block_until_ready is a no-op for plain-jit
arrays on the tunneled axon backend.
"""

import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_aug(precision: str, blocked: bool, stages=("s", "r", "n"),
              speed_method: str = "matmul", fft_dims=None):
    import jax.numpy as jnp

    from wekws_tpu.data.device_aug import DeviceWaveAug, MatmulFFT

    arng = np.random.default_rng(7)
    adt = os.environ.get("BENCH_AUG_DTYPE", "float32")
    s_in = 32000
    out_len = int(np.ceil(s_in / 0.9)) if "s" in stages else s_in
    n_rows = 400
    bank = np.zeros((512, out_len), np.float32)
    bank[:n_rows] = (arng.standard_normal((n_rows, out_len))
                     * 300).astype(np.float32)
    rirs = arng.standard_normal((20, 4000))
    rirs /= np.sqrt((rirs ** 2).sum(1, keepdims=True))
    if blocked:
        fft = MatmulFFT.for_block(4000, precision=precision, dtype=adt)
        rir_len = 4000
    elif fft_dims is not None:
        fft = MatmulFFT(*fft_dims, precision=precision, dtype=adt)
        assert fft.n >= out_len + 4000 - 1, (fft.n, out_len)
        rir_len = 0
    else:
        fft = MatmulFFT.for_length(out_len + 4000 - 1,
                                   precision=precision, dtype=adt)
        rir_len = 0
    spec = np.zeros((512, fft.nh), np.complex64)
    for i in range(20):
        spec[i] = fft.spectrum_mat_half(rirs[i]).reshape(-1)
    return DeviceWaveAug(
        speed_perturb="s" in stages, speeds=(0.9, 1.0, 1.1),
        fft=fft,
        rir_re=jnp.asarray(spec.real, adt),
        rir_im=jnp.asarray(spec.imag, adt),
        n_rirs=20, reverb_prob=0.5 if "r" in stages else 0.0,
        noise_rows=jnp.asarray(bank, adt),
        snr_lo=jnp.zeros((512,), np.float32),
        snr_hi=jnp.full((512,), 15.0, np.float32),
        n_noise_rows=n_rows, noise_prob=0.8 if "n" in stages else 0.0,
        power_scale=1.0 / 32768.0,
        rir_len=rir_len, precision=precision,
        speed_method=speed_method,
    )


def time_aug(name: str, aug, iters: int = 30):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    waves = jnp.asarray(
        rng.integers(-1000, 1000, (512, 32000)).astype(np.float32))
    lengths = jnp.full((512,), 32000, np.int32)
    leaves = aug.leaves()

    @jax.jit
    def step(acc, leaves, key):
        out, new_len = aug.bind(leaves)(key, waves, lengths)
        # data dependence: fold the output back into the carry
        return acc + out[:, :128].sum(), new_len

    key = jax.random.key(1, impl="rbg")
    acc = jnp.zeros(())
    t0 = time.perf_counter()
    acc, _ = step(acc, leaves, key)
    np.asarray(acc)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(iters):
        key, sub = jax.random.split(key)
        acc, _ = step(acc, leaves, sub)
    np.asarray(acc)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:46s}: {ms:8.2f} ms/step  (compile {compile_s:.1f} s)",
          flush=True)
    return ms


def main():
    import jax

    print(f"devices: {jax.devices()}", flush=True)
    only = os.environ.get("PROBE_ONLY", "")
    suite = os.environ.get("PROBE_SUITE", "layout")
    if suite == "precision":  # the r5 first-pass sweep
        variants = [
            ("full-DFT  precision=high   (r4 shipped)",
             dict(precision="high", blocked=False)),
            ("full-DFT  precision=default",
             dict(precision="default", blocked=False)),
            ("blocked   precision=high",
             dict(precision="high", blocked=True)),
            ("blocked   precision=default",
             dict(precision="default", blocked=True)),
        ]
    else:  # layout sweep: speed-conv + 128-aligned DFT factors
        variants = [
            ("full 256x155 speed=matmul (r5 baseline)",
             dict(precision="default", blocked=False,
                  speed_method="matmul")),
            ("full 256x155 speed=conv",
             dict(precision="default", blocked=False,
                  speed_method="conv")),
            ("full 320x128 speed=conv",
             dict(precision="default", blocked=False,
                  speed_method="conv", fft_dims=(320, 128))),
            ("full 256x256 speed=conv",
             dict(precision="default", blocked=False,
                  speed_method="conv", fft_dims=(256, 256))),
        ]
    for name, kw in variants:
        if only and only not in name:
            continue
        time_aug(name, build_aug(**kw))
    if not only and suite == "precision":
        for stages, label in [(("s",), "speed only"),
                              (("r",), "reverb only (blocked/default)"),
                              (("n",), "noise only (default)")]:
            time_aug(f"stage: {label}",
                     build_aug("default", True, stages=stages))


if __name__ == "__main__":
    main()
