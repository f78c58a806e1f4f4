"""Model export CLI with parity gate.

Replaces the reference's export_jit.py / export_onnx.py pair:
* ``--format graph`` (default): portable graph artifact for the C++
  streaming runtime (wekws_tpu.export.graph) with cache metadata, plus
  a numerical parity check of the artifact against the flax forward
  (the reference's ONNX parity gate, export_onnx.py:79-94).
* ``--format stablehlo``: serialized StableHLO of the jitted cached
  forward step via jax.export (the jit.script analog for XLA-backed
  servers).
"""

import argparse
import os

import numpy as np
import yaml


def get_args():
    parser = argparse.ArgumentParser(description="export model")
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--format", default="graph",
                        choices=["graph", "stablehlo"])
    parser.add_argument("--chunk_frames", type=int, default=32,
                        help="stablehlo: static frames per step")
    return parser.parse_args()


def main():
    args = get_args()
    import jax
    import jax.numpy as jnp

    from wekws_tpu.data.device_pipeline import DeviceFeaturePipeline
    from wekws_tpu.models import init_model
    from wekws_tpu.train import load_checkpoint

    with open(args.config) as f:
        configs = yaml.safe_load(f)
    pipeline = DeviceFeaturePipeline.from_conf(
        configs["dataset_conf"], training=False
    )
    # Export always emits float32 weights, and the parity gate must
    # compare against exact f32 semantics — strip a training-time
    # 'dtype: bfloat16' so the reference forward doesn't carry bf16
    # rounding (~0.1-0.2 on raw logits, which would fail the 1e-3 gate
    # against the f32 artifact).
    model_conf = {
        k: v for k, v in configs["model"].items() if k != "dtype"
    }
    # bn_dtype rides along with the training dtype (bf16 BN
    # activations, PERF.md r3) — with dtype stripped it would hand
    # bf16 activations to f32 convs (dtype mismatch) and carry bf16
    # rounding into the parity gate
    if isinstance(model_conf.get("backbone"), dict):
        model_conf["backbone"] = {
            k: v for k, v in model_conf["backbone"].items()
            if k != "bn_dtype"
        }
    model = init_model(model_conf)
    input_dim = configs["model"]["input_dim"]
    feats0 = np.zeros((1, 10, input_dim), np.float32)
    variables = model.init(jax.random.PRNGKey(0), feats0)
    template = {
        "params": jax.device_get(variables["params"]),
        "batch_stats": jax.device_get(variables.get("batch_stats", {})),
    }
    params, stats = load_checkpoint(args.checkpoint, template)
    variables = {"params": params, "batch_stats": stats}

    os.makedirs(args.output_dir, exist_ok=True)
    if args.format == "graph":
        from wekws_tpu.export import GraphRuntime, export_model

        export_model(model, variables, configs, args.output_dir)
        # parity gate — the reference forward must use exact f32
        # semantics (a TPU forward at default precision would inject
        # MXU bf16 noise ~4e-3). Prefer pinning to the CPU backend;
        # when the session exposes only the accelerator (e.g. a
        # tunneled chip with no CPU platform registered), force
        # HIGHEST matmul/conv precision instead — same f32 accuracy,
        # and the probe shapes are tiny so the multi-pass lowering
        # doesn't matter.
        rng = np.random.default_rng(0)
        x = rng.standard_normal((1, 100, input_dim)).astype(np.float32)
        try:
            ctx = jax.default_device(jax.devices("cpu")[0])
        except RuntimeError:
            ctx = jax.default_matmul_precision("highest")
        with ctx:
            cpu_vars = jax.device_get(variables)
            want, _ = model.apply(cpu_vars, jnp.asarray(x))
        want = np.asarray(want)
        rt = GraphRuntime(args.output_dir)
        got, _ = rt.forward(x[0])
        if want.ndim == 3:
            got = got[None]
        err = float(np.abs(got - want).max())
        assert err < 1e-3, f"export parity failed: max err {err}"
        print(
            f"graph artifact -> {args.output_dir} "
            f"(cache_len={rt.meta['cache_len']}, "
            f"cache_dim={rt.meta['cache_dim']}, parity max err {err:.2e})"
        )
    else:
        from jax import export as jax_export

        cache0 = model.init_cache(1)

        def step(feats, cache):
            return model.apply(variables, feats, cache, softmax=False)

        feats = jnp.zeros((1, args.chunk_frames, input_dim), jnp.float32)
        exported = jax_export.export(jax.jit(step))(feats, cache0)
        blob = exported.serialize()
        out = os.path.join(args.output_dir, "model.stablehlo")
        with open(out, "wb") as f:
            f.write(blob)
        print(f"stablehlo ({len(blob)} bytes) -> {out}")


if __name__ == "__main__":
    main()
