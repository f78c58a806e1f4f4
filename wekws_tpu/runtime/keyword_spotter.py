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
  fixed-size audio chunks to reuse one compiled program.
"""

import logging
import math
import os
from typing import Dict, Optional

import numpy as np
import yaml

from wekws_tpu.decode.ctc_prefix_beam_search import PrefixBeam, is_sublist
from wekws_tpu.frontend.features import frontend_from_dataset_conf
from wekws_tpu.runtime.streaming_frontend import StreamingFrontend
from wekws_tpu.text.tokenizer import query_token_set, read_lexicon, read_token


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
        import dataclasses

        import jax

        from wekws_tpu.models import init_model
        from wekws_tpu.train import load_checkpoint

        with open(config_path, "r") as fin:
            configs = yaml.safe_load(fin)
        dataset_conf = configs["dataset_conf"]

        base_cfg = frontend_from_dataset_conf(dataset_conf).cfg
        cfg = dataclasses.replace(base_cfg, dither=0.0)
        self.sample_rate = cfg.sample_rate
        self.resolution = cfg.frame_shift_ms / 1000.0
        self.downsampling = int(dataset_conf.get("frame_skip", 1))
        left = right = 0
        if dataset_conf.get("context_expansion", False):
            ce = dataset_conf["context_expansion_conf"]
            left, right = ce.get("left", 0), ce.get("right", 0)
        self.frontend = StreamingFrontend(cfg, left, right, self.downsampling)

        self.model = init_model(configs["model"])
        feats0 = np.zeros(
            (1, 1, cfg.feat_dim * (left + 1 + right)), np.float32
        )
        variables = self.model.init(jax.random.PRNGKey(0), feats0)
        template = {
            "params": jax.device_get(variables["params"]),
            "batch_stats": jax.device_get(variables.get("batch_stats", {})),
        }
        params, stats = load_checkpoint(ckpt_path, template)
        self._variables = {"params": params, "batch_stats": stats}
        logging.info("model %s loaded.", ckpt_path)

        self._apply_jit = jax.jit(
            lambda feats, cache: self.model.apply(
                self._variables, feats, cache, softmax=True
            )
        )
        self._fused_init_cache = None
        if use_fused:
            # whole-backbone Pallas kernel (MDTC serving: 1.3-1.8x
            # lower latency, PERF.md); falls back when unsupported
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

        self.score_beam = score_beam
        self.path_beam = path_beam
        self.threshold = threshold
        self.min_frames = min_frames
        self.max_frames = max_frames
        self.interval_frames = interval_frames

        self.keywords_token: Dict[str, dict] = {}
        self.keywords_idxset = {0}
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

    # ------------- keywords -------------

    def set_keywords(self, keywords: str) -> None:
        keywords_list = keywords.strip().replace(" ", "").split(",")
        self.keywords_token = {}
        self.keywords_idxset = {0}
        for keyword in keywords_list:
            strs, indexes = query_token_set(
                keyword, self.token_table, self.lexicon_table
            )
            self.keywords_token[keyword] = {
                "token_id": tuple(indexes),
                "token_str": " ".join(str(i) for i in indexes),
            }
            self.keywords_idxset.update(indexes)
        self.beam.tokenset = self.keywords_idxset
        logging.info("keywords: %s", self.keywords_token)

    # ------------- streaming -------------

    def accept_wave(self, wave: bytes) -> np.ndarray:
        data = np.frombuffer(wave, dtype="<i2").astype(np.float32)
        # kaldi fbank consumes int16-scale input directly
        feats, idx = self.frontend.accept_waveform(data)
        self._frame_indices = idx
        return feats

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

    def forward(self, wave_chunk: bytes) -> Dict:
        import jax

        feats = self.accept_wave(wave_chunk)
        if feats.shape[0] < 1:
            return {}
        feats_b = feats[None, :, :]
        probs, self.in_cache = self._apply(feats_b, self.in_cache)
        probs = np.asarray(jax.device_get(probs))[0]
        for i in range(probs.shape[0]):
            t = int(self._frame_indices[i])
            self.decode_keywords(t, probs[i])
            self.execute_detection(t)
            if self.activated:
                self.reset()
                break
        self.total_frames = int(self._frame_indices[-1]) + self.downsampling

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
        self.frontend.reset()
        self.in_cache = (
            self._fused_init_cache(1)
            if getattr(self, "_fused_init_cache", None) is not None
            else self.model.init_cache(1)
        )
        self.total_frames = 0
        self.last_active_pos = -1
        self.result: Dict = {}
        self._frame_indices = np.zeros((0,), np.int64)
