"""On-device streaming keyword detection: beam + FSM inside jit.

The host engine (runtime/keyword_spotter.py `StreamDetector`, matching
/root/reference/wekws/bin/stream_kws_ctc.py:400-529) advances a Python
prefix beam and a detection finite-state machine per frame. That is
fine for one stream, but in the batched multi-stream server the host
beam becomes the ceiling: at 256 streams the device step is ~1 ms while
the Python beams cost tens of ms (PERF.md). This module moves the whole
per-frame loop — prefix beam update, keyword sublist match, geometric
score, threshold / duration / refractory gates, beam reset on
activation, stale-keyword reset — into one traced program so the
serving hot path is a single dispatch regardless of stream count.

Semantics replicate `StreamDetector` exactly, including the reference's
quirks it inherits:

* `hit_score` is a PERSISTENT accumulator: every frame whose beam
  contains a keyword multiplies the span's node probabilities in and
  takes a sqrt (stream_kws_ctc.py:441-447); it only resets with the
  beam (activation, stale reset, stream reset).
* Matching order is: best-scoring hypothesis first, keywords in table
  order, first (leftmost) occurrence in the prefix — the first match
  wins (stream_kws_ctc.py:421-438).
* Activation resets the beam and skips the remaining frames of the
  chunk; the conv cache is NOT reset (stream_kws_ctc.py:495-501).
* After each chunk, if the best hypothesis' first token is older than
  `max_frames`, the beam resets (stale keyword, stream_kws_ctc.py:509-512).

Frame indices are absolute (pre-frame-skip numbering): frame i of a
chunk is `t0 + i * downsampling`, matching the streaming frontend's
kept-frame indices.

Known deviation from the host engine: on prefix merges the device beam
keeps the max-pnb contributor's node track where the host keeps the
first-created one (see batched_ctc.py). When a keyword spelling appears
in a merged NOISE-tail hypothesis, its node probabilities — and hence
the accumulated hit_score — can drift between the two engines (up to
tens of percent in adversarial synthetic noise; tests/test_device_stream.py
traces one such case). Detection decisions, keyword identity and
timestamps match exactly in all tested scenarios, and dominant-path
(real) activations match scores to ~1e-7.
"""

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wekws_tpu.decode.batched_ctc import BeamState, _init_state, beam_step


class StreamDecodeState(NamedTuple):
    beam: BeamState
    hit_score: jnp.ndarray        # (B,) f32, persistent accumulator
    last_active_pos: jnp.ndarray  # (B,) int32, -1 = never activated


def init_stream_state(
    b: int, path_beam: int = 20, max_prefix: int = 32
) -> StreamDecodeState:
    return StreamDecodeState(
        beam=_init_state(b, path_beam, max_prefix),
        hit_score=jnp.ones((b,), jnp.float32),
        last_active_pos=jnp.full((b,), -1, jnp.int32),
    )


def make_keyword_arrays(
    keywords_token: Dict[str, dict], vocab: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, list]:
    """Keyword table (as built by build_keyword_tables) -> device arrays.

    Returns (kw_tok (KW, L) int32 -1-padded, kw_len (KW,) int32,
    tokenset_mask (V,) bool incl. blank, kw_names list) with KW rows in
    table order — the match-priority order of the host FSM.
    """
    names = list(keywords_token.keys())
    ids = [list(keywords_token[n]["token_id"]) for n in names]
    max_len = max((len(i) for i in ids), default=1) or 1
    kw_tok = np.full((len(names), max_len), -1, np.int32)
    kw_len = np.zeros((len(names),), np.int32)
    mask = np.zeros((vocab,), bool)
    mask[0] = True  # blank always passes the filter
    for r, seq in enumerate(ids):
        kw_tok[r, : len(seq)] = seq
        kw_len[r] = len(seq)
        mask[seq] = True
    return kw_tok, kw_len, mask, names


def _match_keywords(beam: BeamState, kw_tok, kw_len):
    """First (hyp, keyword, offset) sublist match per batch row.

    Returns matched (B,), kw index (B,), start/end abs frames (B,),
    span probability product (B,). Priority is lexicographic over
    (hypothesis rank, keyword row, offset) — host FSM order.
    """
    b, w, u = beam.prefixes.shape
    kw, lmax = kw_tok.shape

    off = jnp.arange(u)
    ok = jnp.ones((b, w, kw, u), bool)
    for j in range(lmax):
        idx = jnp.minimum(off + j, u - 1)       # (U,)
        pj = beam.prefixes[:, :, idx]            # (B, W, U)
        past = (j >= kw_len)[None, None, :, None]
        eq = pj[:, :, None, :] == kw_tok[None, None, :, j, None]
        ok = ok & (eq | past)
    fits = off[None, None, None, :] + kw_len[None, None, :, None] \
        <= beam.plen[:, :, None, None]
    match = (
        ok
        & fits
        & beam.valid[:, :, None, None]
        & (kw_len > 0)[None, None, :, None]
    )

    flat = match.reshape(b, w * kw * u)
    pri = jnp.arange(w * kw * u, dtype=jnp.int32)
    big = jnp.int32(w * kw * u)
    sel = jnp.min(jnp.where(flat, pri[None, :], big), axis=1)  # (B,)
    matched = sel < big
    sel = jnp.minimum(sel, big - 1)
    wsel = sel // (kw * u)
    rem = sel % (kw * u)
    kwsel = rem // u
    osel = rem % u

    def row(arr):  # (B, W, U) -> (B, U) at hypothesis wsel
        return jnp.take_along_axis(
            arr, wsel[:, None, None], axis=1
        )[:, 0, :]

    nframe = row(beam.node_frame)
    nprob = row(beam.node_prob)
    mlen = kw_len[kwsel]  # (B,)

    def at(arr, pos):  # (B, U), (B,) -> (B,)
        return jnp.take_along_axis(
            arr, jnp.minimum(pos, u - 1)[:, None], axis=1
        )[:, 0]

    start = at(nframe, osel)
    end = at(nframe, osel + jnp.maximum(mlen - 1, 0))
    prod = jnp.ones((b,), jnp.float32)
    for j in range(lmax):
        prod = prod * jnp.where(j < mlen, at(nprob, osel + j), 1.0)
    return matched, kwsel, start, end, prod


def stream_detect_step(
    state: StreamDecodeState,
    probs: jnp.ndarray,
    active: jnp.ndarray,
    reset: jnp.ndarray,
    t0: jnp.ndarray,
    kw_tok: jnp.ndarray,
    kw_len: jnp.ndarray,
    tokenset_mask: jnp.ndarray,
    lengths: jnp.ndarray = None,
    *,
    threshold: float,
    min_frames: int,
    max_frames: int,
    interval_frames: int,
    downsampling: int = 1,
    score_beam: int = 3,
    prob_threshold: float = 0.05,
    unroll: int = 1,
):
    """Advance every stream's beam+FSM over one chunk of posteriors.

    probs: (B, T, V) softmaxed; active: (B,) bool — rows that actually
    hold T new frames (others stay bit-identical); reset: (B,) bool —
    full per-row state reset applied first (new client in the slot);
    t0: (B,) int32 absolute frame index of the chunk's first frame;
    lengths: optional (B,) int32 valid-frame count per row — frames at
    positions >= lengths[b] are zero padding (a flushed tail) and must
    leave row b's decode state and events untouched (None = all rows
    carry T frames).

    Returns (new_state, events) where events holds (B,) arrays:
    fired (bool), kw (int32 row into the keyword table), start/end
    (int32 absolute frames), score (f32) — at most one activation per
    row per chunk (the FSM skips the rest of the chunk, as the host).
    """
    b, t_len, _v = probs.shape
    w = state.beam.pb.shape[1]
    u = state.beam.prefixes.shape[2]

    fresh = init_stream_state(b, w, u)

    def sel_rows(mask, new, old):
        return jax.tree.map(
            lambda n, o: jnp.where(
                mask.reshape((b,) + (1,) * (n.ndim - 1)), n, o
            ),
            new,
            old,
        )

    state = StreamDecodeState(
        beam=sel_rows(reset, fresh.beam, state.beam),
        hit_score=jnp.where(reset, 1.0, state.hit_score),
        last_active_pos=jnp.where(reset, -1, state.last_active_pos),
    )

    ev0 = dict(
        fired=jnp.zeros((b,), bool),
        kw=jnp.zeros((b,), jnp.int32),
        start=jnp.zeros((b,), jnp.int32),
        end=jnp.zeros((b,), jnp.int32),
        score=jnp.zeros((b,), jnp.float32),
    )

    if lengths is None:
        lengths = jnp.full((b,), t_len, jnp.int32)

    def frame(carry, xs):
        st, done, ev = carry
        p_t, i = xs
        abs_t = t0 + i * downsampling
        live = active & ~done & (i < lengths)

        beam = beam_step(
            st.beam, p_t, abs_t, live, tokenset_mask,
            score_beam=score_beam, prob_threshold=prob_threshold,
        )

        matched, kwsel, m_start, m_end, m_prod = _match_keywords(
            beam, kw_tok, kw_len
        )
        matched = matched & live
        hs = jnp.where(
            matched, jnp.sqrt(st.hit_score * m_prod), st.hit_score
        )
        dur = m_end - m_start
        fire = (
            matched
            & (hs >= threshold)
            & (dur >= min_frames)
            & (dur <= max_frames)
            & (
                (st.last_active_pos == -1)
                | (m_end - st.last_active_pos >= interval_frames)
            )
        )

        new_st = StreamDecodeState(
            beam=sel_rows(fire, fresh.beam, beam),
            hit_score=jnp.where(live, jnp.where(fire, 1.0, hs),
                                st.hit_score),
            last_active_pos=jnp.where(fire, m_end, st.last_active_pos),
        )
        ev = dict(
            fired=ev["fired"] | fire,
            kw=jnp.where(fire, kwsel, ev["kw"]),
            start=jnp.where(fire, m_start, ev["start"]),
            end=jnp.where(fire, m_end, ev["end"]),
            score=jnp.where(fire, hs, ev["score"]),
        )
        return (new_st, done | fire, ev), None

    xs = (
        jnp.moveaxis(probs, 1, 0),                 # (T, B, V)
        jnp.arange(t_len, dtype=jnp.int32),
    )
    (state, _done, events), _ = jax.lax.scan(
        frame, (state, jnp.zeros((b,), bool), ev0), xs,
        unroll=min(unroll, t_len),
    )

    # stale-keyword reset at chunk end (host: process() tail).
    total = t0 + lengths * jnp.int32(downsampling)
    kw_start = state.beam.node_frame[:, 0, 0]
    stale = (
        active
        & (state.beam.plen[:, 0] > 0)
        & ((total - kw_start) > max_frames)
    )
    state = StreamDecodeState(
        beam=sel_rows(stale, fresh.beam, state.beam),
        hit_score=jnp.where(stale, 1.0, state.hit_score),
        last_active_pos=state.last_active_pos,
    )
    return state, events
