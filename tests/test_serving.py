"""KWS serving daemon: protocol framing, event delivery, slot
lifecycle. The engine's device step is stubbed with deterministic
posteriors so the tests pin the network/server semantics, not the
model (engine exactness is covered in test_runtime.py)."""

import asyncio
import threading
import time

import numpy as np
import pytest

from wekws_tpu.serving import protocol as P


class TestProtocol:
    def test_roundtrip(self):
        msg = P.pack(P.MSG_AUDIO, b"\x01\x02\x03")
        mtype, length = P.unpack_header(msg[: P.HEADER_SIZE])
        assert mtype == P.MSG_AUDIO
        assert length == 3
        assert msg[P.HEADER_SIZE:] == b"\x01\x02\x03"

    def test_json_roundtrip(self):
        import json

        msg = P.pack_json(P.MSG_EVENT, {"keyword": "ok", "score": 0.9})
        _, length = P.unpack_header(msg[: P.HEADER_SIZE])
        assert json.loads(msg[P.HEADER_SIZE:]) == {
            "keyword": "ok", "score": 0.9,
        }

    def test_oversize_rejected(self):
        with pytest.raises(ValueError):
            P.pack(P.MSG_AUDIO, b"x" * (P.MAX_PAYLOAD + 1))
        big = P.HEADER_SIZE * b"\xff"
        with pytest.raises(ValueError):
            P.unpack_header(big[: P.HEADER_SIZE])


def _write_tiny_model(tmp_path, *, dither, seed):
    """Write the shared tiny DS-TCN max-pooling test model (config yaml
    + checkpoint) under ``tmp_path``; returns (config_path, ckpt_path).
    Single source for every engine/daemon fixture in this file."""
    import jax
    import yaml as _yaml

    from wekws_tpu.models import init_model
    from wekws_tpu.train import save_checkpoint

    configs = {
        "dataset_conf": {
            "feats_type": "fbank",
            "fbank_conf": {"num_mel_bins": 23, "frame_shift": 10,
                           "frame_length": 25, "dither": dither},
        },
        "model": {
            "input_dim": 23, "output_dim": 2, "hidden_dim": 16,
            "preprocessing": {"type": "linear"},
            "backbone": {"type": "tcn", "ds": True, "num_layers": 2,
                         "kernel_size": 4, "dropout": 0.0},
        },
    }
    tmp_path.mkdir(parents=True, exist_ok=True)
    config_path = tmp_path / "config.yaml"
    config_path.write_text(_yaml.dump(configs))
    model = init_model(configs["model"])
    variables = model.init(
        jax.random.PRNGKey(seed), np.zeros((1, 10, 23), np.float32)
    )
    ckpt = tmp_path / "final.ckpt"
    save_checkpoint(
        str(ckpt), variables["params"], variables.get("batch_stats", {})
    )
    return config_path, ckpt


def _make_engine(tmp_path, num_streams):
    """Tiny max-pooling engine with a stubbed device step: keyword 1
    ('ok') hot at 0.9 on every frame."""
    from wekws_tpu.runtime import BatchMaxPoolSpotter

    config_path, ckpt = _write_tiny_model(tmp_path, dither=1.0, seed=0)
    eng = BatchMaxPoolSpotter(
        str(ckpt), str(config_path), threshold=0.5,
        num_streams=num_streams, step_frames=8, interval_frames=30,
        keyword_names=["hey", "ok"],
    )

    def fake_step(feats, active, reset, cache):
        n, t = feats.shape[0], feats.shape[1]
        probs = np.zeros((n, t, 2), np.float32)
        probs[:, :, 1] = 0.9
        return probs, cache

    eng._step_jit = fake_step
    return eng


class _ServerThread:
    """KwsServer on its own event loop thread; port auto-assigned."""

    def __init__(self, engine):
        from wekws_tpu.serving import KwsServer

        self.server = KwsServer(engine, "127.0.0.1", 0)
        self._started = threading.Event()
        self._loop = None
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()
        assert self._started.wait(10), "server failed to start"

    def _run(self):
        async def main():
            self._loop = asyncio.get_running_loop()
            await self.server.start()
            self._started.set()
            try:
                await self.server._server.serve_forever()
            except asyncio.CancelledError:
                pass

        asyncio.run(main())

    @property
    def port(self):
        return self.server.port

    def stop(self):
        fut = asyncio.run_coroutine_threadsafe(
            self.server.stop(), self._loop
        )
        try:
            fut.result(10)
        except Exception:
            pass
        self.thread.join(10)


@pytest.fixture
def served_engine(tmp_path):
    st = _ServerThread(_make_engine(tmp_path, num_streams=2))
    yield st
    st.stop()


def _pcm(seconds=1.0):
    return np.zeros(int(16000 * seconds), "<i2").tobytes()


class TestKwsServer:
    def test_events_and_flush(self, served_engine):
        from wekws_tpu.serving import KwsClient

        with KwsClient("127.0.0.1", served_engine.port) as c:
            c.send_audio(_pcm(1.0))
            events = []
            deadline = time.time() + 10
            while not events and time.time() < deadline:
                events = c.poll_events()
                time.sleep(0.02)
            events += c.finish()
        assert events, "no detection events received"
        assert all(e["keyword"] == "ok" for e in events)
        assert events[0]["frame"] == 0
        # refractory: fires spaced by > interval_frames
        frames = [e["frame"] for e in events]
        assert all(b - a > 30 for a, b in zip(frames, frames[1:]))

    def test_two_clients_independent_slots(self, served_engine):
        from wekws_tpu.serving import KwsClient

        c1 = KwsClient("127.0.0.1", served_engine.port)
        c2 = KwsClient("127.0.0.1", served_engine.port)
        assert c1.stream != c2.stream
        c1.send_audio(_pcm(0.5))
        c2.send_audio(_pcm(0.5))
        e1 = c1.finish()
        e2 = c2.finish()
        # both streams detect from their own frame clock
        assert e1 and e1[0]["frame"] == 0
        assert e2 and e2[0]["frame"] == 0

    def test_slot_reuse_resets_state(self, served_engine):
        from wekws_tpu.serving import KwsClient

        with KwsClient("127.0.0.1", served_engine.port) as c:
            c.send_audio(_pcm(0.5))
            first = c.finish()
        assert first and first[0]["frame"] == 0
        # a new client on the freed slot starts from frame 0 again
        # (cache + refractory were reset)
        with KwsClient("127.0.0.1", served_engine.port) as c:
            c.send_audio(_pcm(0.5))
            again = c.finish()
        assert again and again[0]["frame"] == 0

    def test_server_full(self, tmp_path):
        from wekws_tpu.serving import KwsClient

        st = _ServerThread(_make_engine(tmp_path, num_streams=1))
        try:
            c1 = KwsClient("127.0.0.1", st.port)
            with pytest.raises(ConnectionError, match="refused"):
                KwsClient("127.0.0.1", st.port)
            c1.close()
        finally:
            st.stop()


class TestServeDaemonMesh:
    """bin/serve.py --mesh_devices: the daemon's build path constructs
    a stream-axis-sharded engine and serves it over TCP.  Engine-level
    sharded==single exactness is pinned in test_device_stream.py; this
    covers the daemon wiring — build_engine's Namespace handling plus
    event delivery off a mesh-sharded engine — by A/B-ing the full
    client→TCP→engine→event path with and without the mesh."""

    def _serve_events(self, engine, pcm):
        from wekws_tpu.serving import KwsClient

        st = _ServerThread(engine)
        try:
            with KwsClient("127.0.0.1", st.port) as c:
                for off in range(0, len(pcm), 6400):
                    c.send_audio(pcm[off : off + 6400])
                events = c.finish()
        finally:
            st.stop()
        return [(e["keyword"], e["frame"]) for e in events]

    def test_mesh_daemon_matches_unsharded(self, tmp_path, rng):
        from wekws_tpu.bin.serve import build_engine

        pcm = (rng.standard_normal(32000) * 3000).astype("<i2").tobytes()
        base = self._serve_events(
            build_engine(_real_engine_args(tmp_path / "a", 0)), pcm
        )
        sharded = self._serve_events(
            build_engine(_real_engine_args(tmp_path / "b", 8)), pcm
        )
        assert sharded == base
        assert base, "threshold too high — no events; test is vacuous"


def _real_engine_args(tmp_path, mesh_devices):
    """bin/serve.py-shaped Namespace over a real (unstubbed) tiny
    max-pooling model written under ``tmp_path``."""
    import argparse

    config_path, ckpt = _write_tiny_model(tmp_path, dither=0.0, seed=7)
    return argparse.Namespace(
        maxpool=True, keywords="hey,ok", config=str(config_path),
        checkpoint=str(ckpt), threshold=0.05, streams=8,
        step_frames=8, interval_frames=30, mesh_devices=mesh_devices,
        token_file=None, lexicon_file=None, min_frames=5,
        max_frames=250, score_beam=3, path_beam=20,
        device_decode=False,
    )


class TestWarmupAndCompileCache:
    def test_warmup_engine_leaves_clean_slots(self, tmp_path, rng):
        """warmup_engine compiles via slot 0 then resets it; a client
        arriving afterwards sees fresh state (frame clock at 0)."""
        from wekws_tpu.bin.serve import build_engine, warmup_engine
        from wekws_tpu.serving import KwsClient

        eng = build_engine(_real_engine_args(tmp_path, 0))
        warmup_engine(eng)
        assert eng.pending_frames(0) == 0
        assert eng.step() == {}  # nothing active after warmup
        # dispatch stats are cleared too — the warmup's compile time
        # must not skew later 'avg dispatch' readouts
        assert eng.stats["dispatches"] == 0
        assert eng.stats["dispatch_s"] == 0.0
        st = _ServerThread(eng)
        try:
            pcm = (rng.standard_normal(16000) * 3000).astype("<i2")
            with KwsClient("127.0.0.1", st.port) as c:
                c.send_audio(pcm.tobytes())
                events = c.finish()
        finally:
            st.stop()
        assert events and events[0]["frame"] < 50

    def test_compilation_cache_populates(self, tmp_path):
        """--compilation_cache_dir persists compiled serving programs
        so a daemon restart skips the XLA compile."""
        import jax

        from wekws_tpu.bin.common import enable_compilation_cache
        from wekws_tpu.bin.serve import build_engine, warmup_engine

        cache = tmp_path / "xla_cache"
        # enable_compilation_cache mutates three global config values;
        # restore ALL of them so later tests aren't order-dependent.
        keys = (
            "jax_compilation_cache_dir",
            "jax_persistent_cache_min_compile_time_secs",
            "jax_persistent_cache_min_entry_size_bytes",
        )
        saved = {k: getattr(jax.config, k) for k in keys}
        enable_compilation_cache(str(cache))
        try:
            eng = build_engine(_real_engine_args(tmp_path, 0))
            warmup_engine(eng)
            assert any(cache.iterdir()), "cache dir stayed empty"
        finally:
            for k, v in saved.items():
                jax.config.update(k, v)
