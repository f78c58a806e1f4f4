"""Online streaming keyword spotting engine (CTC path).

Equivalent of the reference's ``KeyWordSpotter``
(/root/reference/wekws/bin/stream_kws_ctc.py:218-529): PCM chunks ->
stateful frontend -> cached model forward -> frame-synchronous prefix
beam decode -> detection FSM with threshold / duration / refractory
gating, beam reset on activation or stale keyword.

Differences (intentional):
* decode state is the shared ``PrefixBeam`` (wekws_tpu.decode), not an
  inline copy of the beam-search code;
* model inference is a jitted flax apply with a pytree cache; feed
  fixed-size audio chunks to reuse one compiled program;
* the per-stream beam + FSM state lives in ``StreamDetector`` so the
  batched multi-stream engine (runtime/batch_spotter.py) shares the
  exact same detection semantics.
"""

import logging
import math
from typing import Dict, Optional

import numpy as np
import yaml

from wekws_tpu.decode.ctc_prefix_beam_search import PrefixBeam, is_sublist
from wekws_tpu.frontend.features import frontend_from_dataset_conf
from wekws_tpu.runtime.streaming_frontend import StreamingFrontend
from wekws_tpu.text.tokenizer import query_token_set, read_lexicon, read_token


class StreamDetector:
    """Beam + detection FSM for ONE audio stream.

    Semantics match the reference's in-class FSM
    (/root/reference/wekws/bin/stream_kws_ctc.py:400-529): frame-sync
    beam update, sublist keyword match with geometric-mean token score,
    threshold / min-max duration / refractory-interval gates, beam
    reset on activation, stale-keyword beam reset.
    """

    def __init__(
        self,
        threshold: float,
        min_frames: int,
        max_frames: int,
        interval_frames: int,
        score_beam: int,
        path_beam: int,
        resolution: float,
        downsampling: int,
    ):
        self.threshold = threshold
        self.min_frames = min_frames
        self.max_frames = max_frames
        self.interval_frames = interval_frames
        self.score_beam = score_beam
        self.path_beam = path_beam
        self.resolution = resolution
        self.downsampling = downsampling
        self.keywords_token: Dict[str, dict] = {}
        self.keywords_idxset = {0}
        self.reset_all()

    # ------------- keyword tables -------------

    def set_tables(self, keywords_token: Dict, keywords_idxset: set) -> None:
        self.keywords_token = keywords_token
        self.keywords_idxset = keywords_idxset
        self.beam.tokenset = keywords_idxset

    # ------------- per-frame FSM -------------

    def decode_keywords(self, t: int, probs: np.ndarray) -> None:
        self.beam.abs_frame = t
        self.beam.step(probs)

    def execute_detection(self, t: int) -> None:
        hit_keyword = None
        start = end = 0
        hyps = self.beam.hypotheses()
        for prefix_ids, _score, nodes in hyps:
            for word, info in self.keywords_token.items():
                lab = list(info["token_id"])
                offset = is_sublist(list(prefix_ids), lab)
                if offset != -1 and lab:
                    hit_keyword = word
                    start = nodes[offset]["frame"]
                    end = nodes[offset + len(lab) - 1]["frame"]
                    for i in range(offset, offset + len(lab)):
                        self.hit_score *= nodes[i]["prob"]
                    break
            if hit_keyword is not None:
                self.hit_score = math.sqrt(self.hit_score)
                break

        duration = end - start
        if hit_keyword is not None:
            if (
                self.hit_score >= self.threshold
                and self.min_frames <= duration <= self.max_frames
                and (
                    self.last_active_pos == -1
                    or end - self.last_active_pos >= self.interval_frames
                )
            ):
                self.activated = True
                self.last_active_pos = end
                # absolute frame at which the FSM fired — consumed by
                # the detection-latency SLO bench (the wake-word
                # deployment metric: audio the engine had to see past
                # the keyword before the event)
                self.activation_frame = t
                logging.info(
                    "Frame %d detect %s from %d to %d (dur %d, score %.3f) "
                    "Activated.",
                    t, hit_keyword, start, end, duration, self.hit_score,
                )
        self.result = {
            "state": 1 if self.activated else 0,
            "keyword": hit_keyword if self.activated else None,
            "start": start * self.resolution if self.activated else None,
            "end": end * self.resolution if self.activated else None,
            "score": self.hit_score if self.activated else None,
        }

    def process(self, frame_indices: np.ndarray, probs: np.ndarray) -> Dict:
        """Run the FSM over one chunk of posteriors.

        frame_indices: absolute frame index per row; probs: (N, V).
        On activation the beam resets and the rest of the chunk is
        skipped (stream_kws_ctc.py:495-501). Returns the rolling
        result dict (state 1 exactly on the activating chunk).
        """
        if probs.shape[0] < 1:
            return {}
        for i in range(probs.shape[0]):
            t = int(frame_indices[i])
            self.decode_keywords(t, probs[i])
            self.execute_detection(t)
            if self.activated:
                self.reset()
                break
        self.total_frames = int(frame_indices[-1]) + self.downsampling

        # stale-keyword beam reset (stream_kws_ctc.py:509-512)
        if self.beam.cur_hyps and len(self.beam.cur_hyps[0][0]) > 0:
            nodes = self.beam.cur_hyps[0][1][2]
            if nodes:
                keyword_may_start = int(nodes[0]["frame"])
                if (self.total_frames - keyword_may_start) > self.max_frames:
                    self.reset()
        return self.result

    # ------------- state -------------

    def reset(self) -> None:
        self.beam = PrefixBeam(
            self.keywords_idxset, self.score_beam, self.path_beam
        )
        self.activated = False
        self.hit_score = 1.0

    def reset_all(self) -> None:
        self.reset()
        self.total_frames = 0
        self.activation_frame = -1
        self.last_active_pos = -1
        self.result: Dict = {}


def load_spotter_config(config_path: str):
    """Parse a resolved train config into frontend/model pieces shared
    by the single- and multi-stream engines."""
    import dataclasses

    with open(config_path, "r") as fin:
        configs = yaml.safe_load(fin)
    dataset_conf = configs["dataset_conf"]

    base_cfg = frontend_from_dataset_conf(dataset_conf).cfg
    cfg = dataclasses.replace(base_cfg, dither=0.0)
    downsampling = int(dataset_conf.get("frame_skip", 1))
    left = right = 0
    if dataset_conf.get("context_expansion", False):
        ce = dataset_conf["context_expansion_conf"]
        left, right = ce.get("left", 0), ce.get("right", 0)
    return configs, cfg, left, right, downsampling


def load_serving_model(configs: dict, ckpt_path: str, feat_dim: int):
    """Model for a serving engine: a flax checkpoint file, OR an
    exported artifact DIRECTORY (model.json + weights[.int8].bin —
    export/jax_runtime.ArtifactModelAdapter), so float and static-int8
    artifacts serve through the same engines with no re-export."""
    import os

    if os.path.isdir(ckpt_path) and os.path.exists(
            os.path.join(ckpt_path, "model.json")):
        from wekws_tpu.export.jax_runtime import load_artifact_model

        logging.info("serving graph artifact %s", ckpt_path)
        return load_artifact_model(ckpt_path)
    return load_spotter_model(configs, ckpt_path, feat_dim)


def load_spotter_model(configs: dict, ckpt_path: str, feat_dim: int):
    """Build the model + load checkpoint; returns (model, variables)."""
    import jax

    from wekws_tpu.models import init_model
    from wekws_tpu.train import load_checkpoint

    model = init_model(configs["model"])
    feats0 = np.zeros((1, 1, feat_dim), np.float32)
    variables = model.init(jax.random.PRNGKey(0), feats0)
    template = {
        "params": jax.device_get(variables["params"]),
        "batch_stats": jax.device_get(variables.get("batch_stats", {})),
    }
    params, stats = load_checkpoint(ckpt_path, template)
    logging.info("model %s loaded.", ckpt_path)
    return model, {"params": params, "batch_stats": stats}


class KeyWordSpotter:
    def __init__(
        self,
        ckpt_path: str,
        config_path: str,
        token_path: str,
        lexicon_path: Optional[str],
        threshold: float,
        min_frames: int = 5,
        max_frames: int = 250,
        interval_frames: int = 50,
        score_beam: int = 3,
        path_beam: int = 20,
        use_fused: bool = False,
    ):
        import jax

        configs, cfg, left, right, downsampling = load_spotter_config(
            config_path
        )
        self.sample_rate = cfg.sample_rate
        self.resolution = cfg.frame_shift_ms / 1000.0
        self.downsampling = downsampling
        self.frontend = StreamingFrontend(cfg, left, right, downsampling)

        self.model, self._variables = load_serving_model(
            configs, ckpt_path, cfg.feat_dim * (left + 1 + right)
        )

        self._apply_jit = jax.jit(
            lambda feats, cache: self.model.apply(
                self._variables, feats, cache, softmax=True
            )
        )
        self._fused_init_cache = None
        if use_fused and hasattr(self.model, "backbone"):
            # whole-backbone Pallas kernel (MDTC serving: 1.3-1.8x
            # lower latency, PERF.md); falls back when unsupported
            # (incl. artifact-backed models, which have no flax
            # backbone to extract weights from)
            from wekws_tpu.ops.serving import build_fused_stream

            fused = build_fused_stream(
                self.model, self._variables, softmax=True
            )
            if fused is not None:
                self._apply_jit, self._fused_init_cache = fused
        self._apply = self._bucketed_apply

        self.token_table = read_token(token_path)
        self.lexicon_table = (
            read_lexicon(lexicon_path) if lexicon_path else {}
        )

        self.detector = StreamDetector(
            threshold, min_frames, max_frames, interval_frames,
            score_beam, path_beam, self.resolution, self.downsampling,
        )
        self.reset_all()

    _CHUNK_BUCKETS = (32, 8, 1)

    def _bucketed_apply(self, feats, cache):
        """Run the cached forward in fixed-size sub-chunks so jit
        compiles at most len(_CHUNK_BUCKETS) programs regardless of
        audio chunking (arbitrary T would recompile per length)."""
        import numpy as np_

        t = feats.shape[1]
        outs = []
        start = 0
        while start < t:
            remaining = t - start
            size = next(b for b in self._CHUNK_BUCKETS if b <= remaining)
            piece = feats[:, start : start + size, :]
            probs, cache = self._apply_jit(piece, cache)
            outs.append(np_.asarray(probs))
            start += size
        return np_.concatenate(outs, axis=1), cache

    # ------------- compat delegation to the detector -------------

    @property
    def threshold(self):
        return self.detector.threshold

    @property
    def min_frames(self):
        return self.detector.min_frames

    @property
    def max_frames(self):
        return self.detector.max_frames

    @property
    def interval_frames(self):
        return self.detector.interval_frames

    @property
    def keywords_token(self):
        return self.detector.keywords_token

    @property
    def keywords_idxset(self):
        return self.detector.keywords_idxset

    @property
    def beam(self):
        return self.detector.beam

    @property
    def activated(self):
        return self.detector.activated

    @property
    def hit_score(self):
        return self.detector.hit_score

    @property
    def total_frames(self):
        return self.detector.total_frames

    @property
    def last_active_pos(self):
        return self.detector.last_active_pos

    @property
    def result(self):
        return self.detector.result

    def decode_keywords(self, t: int, probs: np.ndarray) -> None:
        self.detector.decode_keywords(t, probs)

    def execute_detection(self, t: int) -> None:
        self.detector.execute_detection(t)

    # ------------- keywords -------------

    def set_keywords(self, keywords: str) -> None:
        keywords_token, keywords_idxset = build_keyword_tables(
            keywords, self.token_table, self.lexicon_table
        )
        self.detector.set_tables(keywords_token, keywords_idxset)
        logging.info("keywords: %s", keywords_token)

    # ------------- streaming -------------

    def accept_wave(self, wave: bytes) -> np.ndarray:
        data = np.frombuffer(wave, dtype="<i2").astype(np.float32)
        # kaldi fbank consumes int16-scale input directly
        feats, idx = self.frontend.accept_waveform(data)
        self._frame_indices = idx
        return feats

    def forward(self, wave_chunk: bytes) -> Dict:
        import jax

        feats = self.accept_wave(wave_chunk)
        if feats.shape[0] < 1:
            return {}
        feats_b = feats[None, :, :]
        probs, self.in_cache = self._apply(feats_b, self.in_cache)
        probs = np.asarray(jax.device_get(probs))[0]
        return self.detector.process(self._frame_indices, probs)

    # ------------- state -------------

    def reset(self) -> None:
        self.detector.reset()

    def reset_all(self) -> None:
        self.detector.reset_all()
        self.frontend.reset()
        self.in_cache = (
            self._fused_init_cache(1)
            if getattr(self, "_fused_init_cache", None) is not None
            else self.model.init_cache(1)
        )
        self._frame_indices = np.zeros((0,), np.int64)


def build_keyword_tables(keywords: str, token_table, lexicon_table):
    """Keyword string -> ({word: {token_id, token_str}}, token idxset).

    Matches the reference's set_keywords
    (/root/reference/wekws/bin/stream_kws_ctc.py:304-333)."""
    keywords_list = keywords.strip().replace(" ", "").split(",")
    keywords_token: Dict[str, dict] = {}
    keywords_idxset = {0}
    for keyword in keywords_list:
        strs, indexes = query_token_set(keyword, token_table, lexicon_table)
        keywords_token[keyword] = {
            "token_id": tuple(indexes),
            "token_str": " ".join(str(i) for i in indexes),
        }
        keywords_idxset.update(indexes)
    return keywords_token, keywords_idxset
