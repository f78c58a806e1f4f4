"""JaxGraphRuntime (export/jax_runtime.py) — the TPU serving executor
for graph artifacts: parity with the numpy interpreter (the executable
spec of the C++ runtime) on float AND static-int8 artifacts, batched
and streaming."""

import numpy as np
import pytest

from wekws_tpu.export import GraphRuntime
from wekws_tpu.export.jax_runtime import JaxGraphRuntime
from wekws_tpu.export.quantize import quantize_artifact

from test_export import CONFIGS, export_setup


@pytest.mark.parametrize(
    "name", ["ds_tcn_sigmoid", "mdtc_ctc", "fsmn_ctc", "gru_sigmoid",
             "mdtc_global_ce"])
def test_float_matches_np_runtime(name, tmp_path):
    _, _, x, out_dir = export_setup(name, tmp_path)
    np_rt = GraphRuntime(out_dir)
    jx_rt = JaxGraphRuntime(out_dir)
    want, _ = np_rt.forward(x[0])
    got, _ = jx_rt.forward(x[0])
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def _static_q(name, tmp_path, n_calib=8):
    _, _, x, out_dir = export_setup(name, tmp_path)
    rng = np.random.default_rng(0)
    calib = [rng.standard_normal(
        (50, CONFIGS[name]["input_dim"])).astype(np.float32)
        for _ in range(n_calib)]
    qdir = str(tmp_path / f"{name}_static_q")
    quantize_artifact(out_dir, qdir, calib_feats=calib)
    return x, qdir


@pytest.mark.parametrize("name", ["ds_tcn_sigmoid", "fsmn_ctc"])
def test_int8_matches_np_runtime(name, tmp_path):
    """Int8 execution parity: the MXU formulation (int8 dot + zero-
    point colsum fold) is an exact integer identity with np_runtime's
    shifted-int32 arithmetic, so outputs agree to float tolerance."""
    x, qdir = _static_q(name, tmp_path)
    np_rt = GraphRuntime(qdir)
    jx_rt = JaxGraphRuntime(qdir)
    want, _ = np_rt.forward(x[0])
    got, _ = jx_rt.forward(x[0])
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_int8_streaming_matches_full(tmp_path):
    x, qdir = _static_q("ds_tcn_sigmoid", tmp_path)
    jx_rt = JaxGraphRuntime(qdir)
    full, _ = jx_rt.forward(x[0])
    state = jx_rt.init_state(1)
    outs = []
    for s in range(0, x.shape[1], 7):
        y, state = jx_rt.forward(x[:, s:s + 7], state)
        outs.append(np.asarray(y)[0])
    np.testing.assert_allclose(
        np.concatenate(outs), np.asarray(full), atol=1e-6)


def test_batched_rows_match_per_row(tmp_path):
    """One batched dispatch over B streams == B independent runs."""
    x, qdir = _static_q("fsmn_ctc", tmp_path)
    jx_rt = JaxGraphRuntime(qdir)
    rng = np.random.default_rng(3)
    batch = rng.standard_normal((4, 30, 80)).astype(np.float32)
    got, _ = jx_rt.forward(batch)
    for b in range(4):
        row, _ = jx_rt.forward(batch[b])
        np.testing.assert_allclose(
            np.asarray(got)[b], np.asarray(row), atol=1e-6)


def test_int8_det_gate_via_jax(tmp_path):
    """The test_export.py DET-curve gate, executed through the JAX
    int8 path: quantized DET tracks the float DET (verdict r4 #6 —
    'int8 serving kernel passing the DET gate')."""
    from wekws_tpu.eval.det import compute_det, frr_at_fa_per_hour

    _, _, x, out_dir = export_setup("ds_tcn_sigmoid", tmp_path)
    rng = np.random.default_rng(0)
    calib = [rng.standard_normal((50, 40)).astype(np.float32)
             for _ in range(16)]
    qdir = str(tmp_path / "static_q")
    quantize_artifact(out_dir, qdir, calib_feats=calib)
    f32 = JaxGraphRuntime(out_dir)
    q = JaxGraphRuntime(qdir)
    rng = np.random.default_rng(2)

    def tables(rt):
        kw, filler = {}, {}
        for i in range(60):
            gain = 0.25 * (1 + i % 8)
            feats = gain * rng.standard_normal((80, 40)).astype(
                np.float32)
            out, _ = rt.forward(feats)
            (kw if i % 2 == 0 else filler)[f"u{i}"] = \
                np.asarray(out)[:, 0].tolist()
        return kw, filler

    st = rng.bit_generator.state
    kw_a, fil_a = tables(f32)
    rng.bit_generator.state = st
    kw_b, fil_b = tables(q)
    filler_hours = 30 * 80 * 0.01
    det_a = compute_det(kw_a, fil_a, filler_hours, step=0.02)
    det_b = compute_det(kw_b, fil_b, filler_hours, step=0.02)
    frr_delta = max(abs(a[2] - b[2]) for a, b in zip(det_a, det_b))
    assert frr_delta <= 1.5 / 30.0, frr_delta
    for fa_target in (0.5, 1.0, 2.0):
        assert abs(
            frr_at_fa_per_hour(det_a, fa_target)
            - frr_at_fa_per_hour(det_b, fa_target)
        ) <= 0.05


class TestArtifactServing:
    """Serving engines fed an exported artifact DIRECTORY instead of a
    flax checkpoint (runtime.keyword_spotter.load_serving_model ->
    ArtifactModelAdapter): per-frame posteriors must match the
    checkpoint-backed engine, float and static-int8."""

    def _export_from_ckpt(self, spotter_setup, tmp_path, quantize):
        import yaml

        from wekws_tpu.export import export_model
        from wekws_tpu.models import init_model
        from wekws_tpu.train import load_checkpoint

        ckpt, config, tokens = spotter_setup
        configs = yaml.safe_load(open(config))
        model = init_model(configs["model"])
        feats0 = np.zeros((1, 10, configs["model"]["input_dim"]),
                          np.float32)
        import jax

        variables = model.init(jax.random.PRNGKey(0), feats0)
        params, stats = load_checkpoint(ckpt, {
            "params": jax.device_get(variables["params"]),
            "batch_stats": jax.device_get(
                variables.get("batch_stats", {})),
        })
        out_dir = str(tmp_path / "artifact")
        export_model(model, {"params": params, "batch_stats": stats},
                     configs, out_dir)
        if quantize:
            from wekws_tpu.export.quantize import quantize_artifact
            from wekws_tpu.frontend.kaldi import (
                FrontendConfig,
                compute_fbank_np,
            )

            # calibrate on REALISTIC log-mel features (the observers
            # must see the frontend's ~0-17 scale, not unit normals)
            fb = configs["dataset_conf"]["fbank_conf"]
            cfg = FrontendConfig(num_mel_bins=fb["num_mel_bins"],
                                 dither=0.0)
            rng = np.random.default_rng(0)
            calib = [compute_fbank_np(
                (rng.standard_normal(16000) * 500).astype(np.float64),
                cfg) for _ in range(8)]
            qdir = str(tmp_path / "artifact_q")
            quantize_artifact(out_dir, qdir, calib_feats=calib)
            return qdir
        return out_dir

    @pytest.mark.parametrize("quantize", [False, True])
    def test_spotter_posteriors_match(self, spotter_setup, tmp_path,
                                      rng, quantize):
        from wekws_tpu.runtime import KeyWordSpotter

        ckpt, config, tokens = spotter_setup
        art_dir = self._export_from_ckpt(spotter_setup, tmp_path,
                                         quantize)
        ref = KeyWordSpotter(ckpt, config, tokens, None, threshold=0.5)
        art = KeyWordSpotter(art_dir, config, tokens, None,
                             threshold=0.5)
        pcm = (rng.standard_normal(6400) * 500).astype(
            np.int16).tobytes()

        def posteriors(sp):
            sp.reset_all()
            seen = []
            orig = sp.detector.process

            def spy(idx, p):
                seen.append(np.asarray(p).copy())
                return orig(idx, p)

            sp.detector.process = spy
            for off in range(0, len(pcm), 1600):
                sp.forward(pcm[off:off + 1600])
            sp.detector.process = orig
            return np.concatenate(seen, axis=0)

        a = posteriors(ref)
        b = posteriors(art)
        assert a.shape == b.shape
        tol = 0.05 if quantize else 1e-4
        np.testing.assert_allclose(b, a, atol=tol)
