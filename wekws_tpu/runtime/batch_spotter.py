"""Batched multi-stream keyword spotting engine.

Serves N independent PCM streams through ONE jitted, batched, cached
model forward. The reference serves one stream per engine instance
(/root/reference/wekws/bin/stream_kws_ctc.py:218-529 — `KeyWordSpotter`
holds a single cache/beam); on an accelerator behind a dispatch/RTT
floor that wastes almost the whole chip (PERF.md: a single stream is
tunnel-RTT bound at ~2.5x realtime while the batched 8-frame step
handles 16 streams in ~1 ms). This engine is the TPU-native serving
shape: per-stream host state (frontend, beam, FSM — all exact
`StreamDetector` semantics) around one fixed-shape batched device
program.

Correctness under batching:

* **Lockstep frames.** The device step always runs `step_frames`
  frames per stream (one compiled program). A stream participates only
  when it has `step_frames` feature frames queued; non-participating
  rows carry zero features and their cache rows are restored from the
  pre-step cache inside the same jitted program, so a slow stream's
  state is bit-identical to never having run. Causality makes the
  participating rows exact: frame t depends only on frames <= t and
  the cache, never on other batch rows (convs/GRU are per-row; BN runs
  in inference mode from frozen statistics).
* **Stream resets** (slot reuse, client disconnect) zero that row's
  cache via a reset mask consumed by the same program — no per-stream
  dispatch ever happens.
* **`flush()` / `flush_stream()`** drain sub-`step_frames` remainders
  with ONE zero-padded dispatch of the same compiled shape, masked to
  each row's valid length (a T=1 drain would pay the ~RTT dispatch
  floor once per remaining frame). The valid prefix is exact by the
  causality above; the cache row is undefined past it, so flushing
  finalizes the stream (the row resets before its next use).

Detection activation resets only the beam (reference semantics,
stream_kws_ctc.py:495-501) — the conv cache intentionally carries
across an activation, exactly like the single-stream engine.

Two decode modes:

* host (default): per-stream Python `StreamDetector` beams — exact
  single-stream semantics, but the host beams bound scaling (~256
  streams, PERF.md).
* ``device_decode=True``: the beam + detection FSM run INSIDE the same
  jitted program as the model (decode/device_stream.py) — the whole
  hot loop is one dispatch and the host only reads a (N,)-shaped event
  struct per step. Decisions/timestamps match the host FSM exactly
  (tests/test_device_stream.py); activation scores on merged noise
  paths can drift per the documented node-track approximation.
"""

import time
from typing import Dict, List, Optional

import numpy as np

from wekws_tpu.runtime.keyword_spotter import (
    StreamDetector,
    build_keyword_tables,
    load_spotter_config,
    load_serving_model,
)
from wekws_tpu.runtime.streaming_frontend import StreamingFrontend
from wekws_tpu.text.tokenizer import read_lexicon, read_token


class _BatchedStreamEngine:
    """Shared multi-stream machinery: per-stream frontends, pending
    feature queues, lockstep step/flush scheduling and reset masks.

    Subclasses implement
    ``_dispatch(ready, t, feats, active, reset, tvalid)``
    (one batched device step + per-stream result extraction) and
    ``_reset_host_state(stream)`` (clear per-stream decode state)."""

    def _init_streams(self, num_streams: int, step_frames: int) -> None:
        assert num_streams >= 1 and step_frames >= 1
        self.num_streams = num_streams
        self.step_frames = step_frames
        if not hasattr(self, "device_frontend"):
            self.device_frontend = False
        if self.device_frontend:
            # host keeps raw-sample buffers only; fbank+splice+skip run
            # inside the batched dispatch (runtime/device_frontend.py)
            from wekws_tpu.runtime.device_frontend import WaveStreamBuffer

            cfg, left, right, skip = self._frontend_args
            self.frontends = []
            self.wave_bufs: List[WaveStreamBuffer] = [
                WaveStreamBuffer(cfg.frame_shift, cfg.frame_length,
                                 left, right, skip, step_frames)
                for _ in range(num_streams)
            ]
        else:
            self.frontends = [
                StreamingFrontend(*self._frontend_args)
                for _ in range(num_streams)
            ]
        self._pending_feats: List[np.ndarray] = [
            np.zeros((0, self.feat_dim), np.float32)
            for _ in range(num_streams)
        ]
        self._pending_idx: List[np.ndarray] = [
            np.zeros((0,), np.int64) for _ in range(num_streams)
        ]
        self._reset_mask = np.zeros((num_streams,), bool)
        self.cache = self.model.init_cache(num_streams)
        # overflow events beyond the one-result-per-step contract
        # (kept per stream, surfaced on later steps or at flush)
        self._event_backlog: List[List[Dict]] = [
            [] for _ in range(num_streams)
        ]
        # dispatch-batching observability: every _run() counts here,
        # whichever public path (step/flush/flush_stream) invoked it
        self.stats = {"dispatches": 0, "rows": 0, "frames": 0,
                      "dispatch_s": 0.0}

    # ------------- streaming -------------

    def accept_wave(self, stream: int, wave: bytes) -> None:
        """Queue a PCM chunk (int16 LE bytes) for one stream."""
        data = np.frombuffer(wave, dtype="<i2").astype(np.float32)
        if self.device_frontend:
            self.wave_bufs[stream].append(data)  # O(bytes) — no fbank
            return
        feats, idx = self.frontends[stream].accept_waveform(data)
        if feats.shape[0]:
            self._pending_feats[stream] = np.concatenate(
                [self._pending_feats[stream], feats]
            )
            self._pending_idx[stream] = np.concatenate(
                [self._pending_idx[stream], idx]
            )

    def pending_frames(self, stream: int) -> int:
        if self.device_frontend:
            return self.wave_bufs[stream].available_outputs()
        return self._pending_feats[stream].shape[0]

    def step(self) -> Dict[int, Dict]:
        """Run one batched device step over every stream holding at
        least ``step_frames`` queued frames. Returns {stream: result}
        for the streams that ran."""
        ready = [
            i
            for i in range(self.num_streams)
            if self.pending_frames(i) >= self.step_frames
        ]
        if not ready:
            return {}
        return self._run(ready, self.step_frames)

    def flush(self) -> Dict[int, Dict]:
        """Drain every stream's remainder (end of run): full lockstep
        steps first, then ONE zero-padded, length-masked dispatch for
        all sub-step tails together. Returns the last result per
        flushed stream.

        Flushing finalizes a stream: the padded dispatch leaves the
        cache row undefined past the valid frames, so the engine
        schedules a cache-row reset — a flushed slot behaves like a
        fresh one on its next step. The emitted results themselves are
        exact: every backbone is frame-causal in its streaming
        formulation (chunked-with-cache ≡ full forward for ANY chunk
        split, tests/test_models.py), so posteriors for the valid
        prefix of a padded chunk cannot depend on the padding."""
        results: Dict[int, Dict] = {}
        while True:  # full-size steps first
            ran = self.step()
            if not ran:
                break
            results.update(ran)
        tails = {
            i: self.pending_frames(i)
            for i in range(self.num_streams)
            if self.pending_frames(i) >= 1
        }
        if tails:
            results.update(
                self._run(sorted(tails), self.step_frames, lengths=tails)
            )
            for i in tails:
                self._reset_mask[i] = True
        for i in range(self.num_streams):
            drained = self._drain_backlog(i)
            if drained:
                # flush() keeps one (the last) result per stream; a
                # caller that must see every overflow event drains via
                # step()/flush_stream() (the serving daemon's path)
                results[i] = drained[-1]
        return results

    def flush_stream(self, stream: int) -> List[Dict]:
        """Drain one stream's queued frames without stepping the
        others (client disconnect / end-of-stream in a server): full
        lockstep-size steps first, then ONE zero-padded, length-masked
        dispatch for the sub-step remainder (a T=1 drain would pay the
        ~RTT-sized dispatch floor once per remaining frame — measured
        as the dominant cost of a serving daemon under many concurrent
        disconnects). Returns that stream's results in order. See
        flush() for why the padded tail is exact and why it finalizes
        the slot."""
        results: List[Dict] = []
        while self.pending_frames(stream) >= self.step_frames:
            results.append(
                self._run([stream], self.step_frames)[stream]
            )
        rem = self.pending_frames(stream)
        if rem:
            results.append(
                self._run(
                    [stream], self.step_frames, lengths={stream: rem}
                )[stream]
            )
            self._reset_mask[stream] = True
        results.extend(self._drain_backlog(stream))
        return results

    def _drain_backlog(self, stream: int) -> List[Dict]:
        """Queued overflow events (beyond one-result-per-step)."""
        out = self._event_backlog[stream]
        self._event_backlog[stream] = []
        return out

    def _run(
        self,
        ready: List[int],
        t: int,
        lengths: Optional[Dict[int, int]] = None,
    ) -> Dict[int, Dict]:
        """One batched dispatch over ``ready`` rows at chunk size
        ``t``. ``lengths`` marks rows carrying fewer than ``t`` valid
        frames (zero-padded tails); downstream consumption and decode
        are masked to the valid prefix per row."""
        n, d = self.num_streams, self.feat_dim
        active = np.zeros((n,), bool)
        tvalid: Dict[int, int] = {}
        for i in ready:
            k = t
            if lengths is not None and i in lengths:
                k = min(int(lengths[i]), t)
            active[i] = True
            tvalid[i] = k
        if self.device_frontend:
            # fixed-shape wave windows; fbank+splice+skip run inside
            # the dispatch (runtime/device_frontend.py geometry)
            w = self.wave_bufs[0].window_samples
            waves = np.zeros((n, w), np.float32)
            lo = np.zeros((n,), np.int32)
            for i in ready:
                waves[i], lo[i] = self.wave_bufs[i].window()
            feats = (waves, lo)
        else:
            feats = np.zeros((n, t, d), np.float32)
            for i in ready:
                feats[i, :tvalid[i]] = self._pending_feats[i][:tvalid[i]]
        reset = self._reset_mask.copy()
        self._reset_mask[:] = False
        t0 = time.perf_counter()
        out = self._dispatch(ready, t, feats, active, reset, tvalid)
        self.stats["dispatches"] += 1
        self.stats["rows"] += len(ready)
        self.stats["frames"] += sum(tvalid.values())
        self.stats["dispatch_s"] += time.perf_counter() - t0
        return out

    def _consume(self, stream: int, t: int) -> np.ndarray:
        """Advance one stream's queue by ``t`` frames; returns the
        consumed frames' global indices."""
        if self.device_frontend:
            return self.wave_bufs[stream].consume(t)
        idx = self._pending_idx[stream][:t]
        self._pending_feats[stream] = self._pending_feats[stream][t:]
        self._pending_idx[stream] = self._pending_idx[stream][t:]
        return idx

    def _first_idx(self, stream: int) -> int:
        """Absolute (pre-skip spliced) index of the next queued frame."""
        if self.device_frontend:
            return self.wave_bufs[stream]._next
        return int(self._pending_idx[stream][0])

    # ------------- state -------------

    def reset_stream(self, stream: int) -> None:
        """Free a slot for a new client: clears frontend, queue, decode
        state and (on the next device step) the cache row."""
        self._reset_host_state(stream)
        if self.device_frontend:
            self.wave_bufs[stream].reset()
        else:
            self.frontends[stream].reset()
        self._pending_feats[stream] = np.zeros((0, self.feat_dim), np.float32)
        self._pending_idx[stream] = np.zeros((0,), np.int64)
        self._reset_mask[stream] = True

    def reset_all(self) -> None:
        for i in range(self.num_streams):
            self.reset_stream(i)

    def _dispatch(
        self, ready, t, feats, active, reset, tvalid
    ) -> Dict[int, Dict]:
        raise NotImplementedError

    def _reset_host_state(self, stream: int) -> None:
        raise NotImplementedError


class BatchKeywordSpotter(_BatchedStreamEngine):
    def __init__(
        self,
        ckpt_path: str,
        config_path: str,
        token_path: str,
        lexicon_path: Optional[str],
        threshold: float,
        num_streams: int = 16,
        step_frames: int = 8,
        min_frames: int = 5,
        max_frames: int = 250,
        interval_frames: int = 50,
        score_beam: int = 3,
        path_beam: int = 20,
        device_decode: bool = False,
        device_frontend: bool = False,
        max_prefix: int = 32,
        decode_unroll: int = 1,
        mesh=None,
    ):
        """mesh: optional 1-D jax.sharding.Mesh — shards the stream
        axis across devices (every op in the serving step is per-row,
        so XLA partitions it without collectives; params replicate).
        num_streams must divide evenly by the mesh size.

        device_frontend: featurize (fbank + splice + frame-skip) INSIDE
        the batched dispatch instead of per-stream host numpy —
        accept_wave becomes a byte append, removing the host frontend
        cost that scales linearly with stream count (PERF.md r4
        serving SLOs: 16-24 ms per 64-stream step)."""
        import jax
        import jax.numpy as jnp

        self.device_decode = device_decode
        self.device_frontend = device_frontend
        row_s = rep_s = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = mesh.axis_names[0]
            assert num_streams % mesh.devices.size == 0, (
                "num_streams must be a multiple of the mesh size"
            )
            row_s = NamedSharding(mesh, P(axis))
            rep_s = NamedSharding(mesh, P())
            self._events_s = NamedSharding(mesh, P(None, axis))
        self._mesh = mesh

        configs, cfg, left, right, downsampling = load_spotter_config(
            config_path
        )
        self.sample_rate = cfg.sample_rate
        self.resolution = cfg.frame_shift_ms / 1000.0
        self.downsampling = downsampling
        self._frontend_args = (cfg, left, right, downsampling)
        self.feat_dim = cfg.feat_dim * (left + 1 + right)

        self.model, self._variables = load_serving_model(
            configs, ckpt_path, self.feat_dim
        )

        featurize = None
        if device_frontend:
            from wekws_tpu.runtime.device_frontend import (
                build_batch_featurizer,
            )

            featurize, _ = build_batch_featurizer(
                cfg, left, right, downsampling, step_frames
            )

        def step_fn(feats, active, reset, cache):
            if featurize is not None:
                feats = featurize(*feats)  # (waves, lo) -> spliced feats

            def row_mask(mask, leaf):
                return mask.reshape((-1,) + (1,) * (leaf.ndim - 1))

            cache = jax.tree.map(
                lambda c: jnp.where(row_mask(reset, c), 0.0, c), cache
            )
            probs, new_cache = self.model.apply(
                self._variables, feats, cache, softmax=True
            )
            out_cache = jax.tree.map(
                lambda n, o: jnp.where(row_mask(active, n), n, o),
                new_cache,
                cache,
            )
            return probs, out_cache

        front_s = (row_s, row_s) if device_frontend else row_s
        if mesh is None:
            self._step_jit = jax.jit(step_fn)
        else:
            self._step_jit = jax.jit(
                step_fn,
                in_shardings=(front_s, row_s, row_s, row_s),
                out_shardings=(row_s, row_s),
            )
            self._variables = jax.device_put(self._variables, rep_s)

        self._fsm = dict(
            threshold=float(threshold),
            min_frames=int(min_frames),
            max_frames=int(max_frames),
            interval_frames=int(interval_frames),
            downsampling=int(downsampling),
            score_beam=int(score_beam),
            unroll=int(decode_unroll),
        )
        self._path_beam = path_beam
        self._max_prefix = max_prefix
        self._vocab = int(configs["model"]["output_dim"])
        self._kw_arrays = None
        self._kw_names: List[str] = []
        self._dstate = None
        self._combined_jit = None
        if device_decode:
            from wekws_tpu.decode.device_stream import (
                init_stream_state,
                stream_detect_step,
            )

            self._dstate = init_stream_state(
                num_streams, path_beam, max_prefix
            )

            def combined_fn(
                feats, active, reset, t0, lens, cache, dstate,
                kw_tok, kw_len, tokenset_mask,
            ):
                probs, out_cache = step_fn(feats, active, reset, cache)
                dstate, events = stream_detect_step(
                    dstate, probs, active, reset, t0,
                    kw_tok, kw_len, tokenset_mask, lengths=lens,
                    **self._fsm,
                )
                # one (5, N) f32 transfer per step — fetching the five
                # event arrays separately costs ~5 tunnel RTTs/step,
                # which dominated the whole step (PERF.md). Frame
                # indices are < 2^24, exact in f32.
                packed = jnp.stack([
                    events["fired"].astype(jnp.float32),
                    events["kw"].astype(jnp.float32),
                    events["start"].astype(jnp.float32),
                    events["end"].astype(jnp.float32),
                    events["score"],
                ])
                return out_cache, dstate, packed

            if mesh is None:
                self._combined_jit = jax.jit(combined_fn)
            else:
                self._combined_jit = jax.jit(
                    combined_fn,
                    in_shardings=(
                        front_s, row_s, row_s,  # feats/active/reset
                        row_s, row_s,           # t0, lens
                        row_s, row_s,           # cache, decode state
                        rep_s, rep_s, rep_s,    # keyword tables
                    ),
                    out_shardings=(row_s, row_s, self._events_s),
                )

        self.token_table = read_token(token_path)
        self.lexicon_table = (
            read_lexicon(lexicon_path) if lexicon_path else {}
        )
        self.detectors: List[StreamDetector] = [
            StreamDetector(
                threshold, min_frames, max_frames, interval_frames,
                score_beam, path_beam, self.resolution, downsampling,
            )
            for _ in range(num_streams)
        ]
        self._init_streams(num_streams, step_frames)

    # ------------- keywords -------------

    def set_keywords(self, keywords: str) -> None:
        """Shared keyword set for every stream slot."""
        tables = build_keyword_tables(
            keywords, self.token_table, self.lexicon_table
        )
        for det in self.detectors:
            det.set_tables(*tables)
        if self.device_decode:
            from wekws_tpu.decode.device_stream import make_keyword_arrays

            kw_tok, kw_len, mask, names = make_keyword_arrays(
                tables[0], self._vocab
            )
            self._kw_arrays = (kw_tok, kw_len, mask)
            self._kw_names = names

    # ------------- streaming -------------

    def _dispatch(
        self, ready, t, feats, active, reset, tvalid
    ) -> Dict[int, Dict]:
        import jax

        if self.device_decode:
            return self._run_device(
                ready, t, feats, active, reset, tvalid
            )

        probs, self.cache = self._step_jit(feats, active, reset, self.cache)
        probs = np.asarray(jax.device_get(probs))

        results: Dict[int, Dict] = {}
        for i in ready:
            k = tvalid[i]
            idx = self._consume(i, k)
            results[i] = self.detectors[i].process(idx, probs[i][:k])
        return results

    def _run_device(
        self, ready, t, feats, active, reset, tvalid
    ) -> Dict[int, Dict]:
        """One dispatch: model + beam + FSM on device; the host only
        consumes the (N,)-shaped activation events."""
        import jax

        if self._kw_arrays is None:
            raise RuntimeError(
                "device_decode requires set_keywords() before step()"
            )
        n = self.num_streams
        t0 = np.zeros((n,), np.int32)
        lens = np.zeros((n,), np.int32)
        for i in ready:
            t0[i] = self._first_idx(i)
            lens[i] = tvalid[i]
        kw_tok, kw_len, mask = self._kw_arrays
        self.cache, self._dstate, packed = self._combined_jit(
            feats, active, reset, t0, lens, self.cache, self._dstate,
            kw_tok, kw_len, mask,
        )
        ev = np.asarray(jax.device_get(packed))  # (5, N), one transfer

        results: Dict[int, Dict] = {}
        res = self.resolution
        for i in ready:
            self._consume(i, tvalid[i])
            if ev[0, i]:
                results[i] = {
                    "state": 1,
                    "keyword": self._kw_names[int(ev[1, i])],
                    "start": float(ev[2, i]) * res,
                    "end": float(ev[3, i]) * res,
                    "score": float(ev[4, i]),
                }
            else:
                results[i] = {
                    "state": 0, "keyword": None, "start": None,
                    "end": None, "score": None,
                }
        return results

    def _reset_host_state(self, stream: int) -> None:
        self.detectors[stream].reset_all()


class BatchMaxPoolSpotter(_BatchedStreamEngine):
    """Batched multi-stream serving for max-pooling wake-word models.

    The reference has no online engine for max-pooling models beyond
    the C++ runtime's per-frame posterior stream (kws_main prints
    probabilities; the Android app thresholds them with a refractory
    banner — /root/reference/runtime/android/app/src/main/cpp/wekws.cc
    :85-98). This engine applies the same semantics batched: a stream
    fires keyword k at the first frame whose sigmoid posterior reaches
    ``threshold``, then stays silent for that (stream, keyword) for
    ``interval_frames`` frames (the refractory window mirrors
    compute_det's window_shift suppression,
    /root/reference/wekws/bin/compute_det.py:87-96).

    Shares the lockstep batching/cache-restore/reset machinery with
    BatchKeywordSpotter; the model forward keeps its trained sigmoid
    activation (no softmax) and the detection itself is a vectorized
    host comparison over the (T, K) chunk posteriors.
    """

    def __init__(
        self,
        ckpt_path: str,
        config_path: str,
        threshold: float,
        num_streams: int = 16,
        step_frames: int = 8,
        interval_frames: int = 50,
        keyword_names: Optional[List[str]] = None,
        device_frontend: bool = False,
        mesh=None,
    ):
        import jax
        import jax.numpy as jnp

        self.device_frontend = device_frontend
        row_s = rep_s = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = mesh.axis_names[0]
            assert num_streams % mesh.devices.size == 0, (
                "num_streams must be a multiple of the mesh size"
            )
            row_s = NamedSharding(mesh, P(axis))
            rep_s = NamedSharding(mesh, P())

        configs, cfg, left, right, downsampling = load_spotter_config(
            config_path
        )
        self.sample_rate = cfg.sample_rate
        # frontend frame indices are global pre-skip indices
        # (streaming_frontend.py), so wall time is idx * frame_shift
        self.resolution = cfg.frame_shift_ms / 1000.0
        self._frontend_args = (cfg, left, right, downsampling)
        self.feat_dim = cfg.feat_dim * (left + 1 + right)

        self.model, self._variables = load_serving_model(
            configs, ckpt_path, self.feat_dim
        )
        num_keywords = int(configs["model"]["output_dim"])
        self.keyword_names = keyword_names or [
            str(k) for k in range(num_keywords)
        ]
        assert len(self.keyword_names) == num_keywords

        featurize = None
        if device_frontend:
            from wekws_tpu.runtime.device_frontend import (
                build_batch_featurizer,
            )

            featurize, _ = build_batch_featurizer(
                cfg, left, right, downsampling, step_frames
            )

        def step_fn(feats, active, reset, cache):
            if featurize is not None:
                feats = featurize(*feats)

            def row_mask(mask, leaf):
                return mask.reshape((-1,) + (1,) * (leaf.ndim - 1))

            cache = jax.tree.map(
                lambda c: jnp.where(row_mask(reset, c), 0.0, c), cache
            )
            probs, new_cache = self.model.apply(
                self._variables, feats, cache
            )
            out_cache = jax.tree.map(
                lambda n, o: jnp.where(row_mask(active, n), n, o),
                new_cache,
                cache,
            )
            return probs, out_cache

        front_s = (row_s, row_s) if device_frontend else row_s
        if mesh is None:
            self._step_jit = jax.jit(step_fn)
        else:
            self._step_jit = jax.jit(
                step_fn,
                in_shardings=(front_s, row_s, row_s, row_s),
                out_shardings=(row_s, row_s),
            )
            self._variables = jax.device_put(self._variables, rep_s)

        self.threshold = float(threshold)
        self.interval_frames = int(interval_frames)
        self._last_fire = np.full(
            (num_streams, num_keywords), -(10**9), np.int64
        )
        self._init_streams(num_streams, step_frames)

    def _dispatch(
        self, ready, t, feats, active, reset, tvalid
    ) -> Dict[int, Dict]:
        import jax

        probs, self.cache = self._step_jit(feats, active, reset, self.cache)
        probs = np.asarray(jax.device_get(probs))  # (N, T, K)

        results: Dict[int, Dict] = {}
        for i in ready:
            k = tvalid[i]
            idx = self._consume(i, k)
            # one result per stream per step (the engine contract,
            # same as the CTC FSM's one-activation-per-chunk); extra
            # same-chunk fires queue and surface on later steps or at
            # flush, rather than being dropped
            bl = self._event_backlog[i]
            bl.extend(self._detect_events(i, idx, probs[i][:k]))
            results[i] = bl.pop(0) if bl else dict(self._NO_FIRE)
        return results

    _NO_FIRE = {
        "state": 0, "keyword": None, "frame": None,
        "time": None, "score": None,
    }

    def _detect_events(
        self, stream: int, idx: np.ndarray, probs: np.ndarray
    ) -> List[Dict]:
        """ALL threshold crossings in the chunk, refractory applied in
        frame order. Scanning past the first fire matters: a second
        keyword firing later in the same chunk would otherwise never
        be re-examined (its frames are consumed) — with the batched
        tail flush there is no next chunk at end-of-stream to catch
        it."""
        hit = probs >= self.threshold  # (T, K)
        fires: List[Dict] = []
        for row, frame in enumerate(idx):
            open_k = np.flatnonzero(
                hit[row]
                & (frame - self._last_fire[stream] > self.interval_frames)
            )
            if open_k.size == 0:
                continue
            k = int(open_k[np.argmax(probs[row, open_k])])
            self._last_fire[stream, k] = frame
            fires.append({
                "state": 1,
                "keyword": self.keyword_names[k],
                "frame": int(frame),
                "time": float(frame) * self.resolution,
                "score": float(probs[row, k]),
            })
        return fires

    def _reset_host_state(self, stream: int) -> None:
        self._last_fire[stream, :] = -(10**9)
        self._event_backlog[stream] = []
