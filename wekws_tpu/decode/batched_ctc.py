"""Batched, on-device CTC prefix beam search (jittable).

The reference decodes CTC posteriors one utterance at a time in Python
(loss.py:206-312) — the offline-scoring bottleneck for large test sets.
This is a vectorized frame-synchronous prefix beam search over
``(B, T, V)`` posteriors entirely inside jit: beams are fixed-size
arrays, duplicate prefixes are merged by hash-sort + segment-sum, and
per-token {token, frame, prob} node tracks are carried for keyword
timestamps — the same semantics as the host decoder
(wekws_tpu.decode.ctc_prefix_beam_search), including its quirks:

* first prune: top ``score_beam`` tokens, kept if prob > 0.05 (and in
  the keyword token set when given); frames with nothing passing the
  filter leave the beam unchanged;
* the blank transition only applies when blank itself passes the
  filter (probability mass is dropped otherwise, as in the reference);
* a repeated emission updates the last node to its best-scoring frame.

One deliberate approximation: when two parents merge into the same
prefix, the node track of the higher-``pnb`` contributor wins (the
host decoder keeps the first-created track) — scores are identical,
timestamps can differ on merged paths.

Scores are carried in probability space like the reference; with
path_beam papers-style W<=20 and short keywords this is stable.
"""

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

_HASH_MULT = jnp.int32(1000003)


class BeamState(NamedTuple):
    prefixes: jnp.ndarray   # (B, W, U) int32, -1 padded
    plen: jnp.ndarray       # (B, W) int32
    pb: jnp.ndarray         # (B, W) f32  (ends-in-blank prob)
    pnb: jnp.ndarray        # (B, W) f32  (ends-in-token prob)
    node_tok: jnp.ndarray   # (B, W, U) int32
    node_frame: jnp.ndarray  # (B, W, U) int32
    node_prob: jnp.ndarray  # (B, W, U) f32
    valid: jnp.ndarray      # (B, W) bool
    phash: jnp.ndarray      # (B, W) int32 rolling prefix hash


def _init_state(b: int, w: int, u: int) -> BeamState:
    return BeamState(
        prefixes=jnp.full((b, w, u), -1, jnp.int32),
        plen=jnp.zeros((b, w), jnp.int32),
        pb=jnp.concatenate(
            [jnp.ones((b, 1)), jnp.zeros((b, w - 1))], axis=1
        ),
        pnb=jnp.zeros((b, w), jnp.float32),
        node_tok=jnp.full((b, w, u), -1, jnp.int32),
        node_frame=jnp.zeros((b, w, u), jnp.int32),
        node_prob=jnp.zeros((b, w, u), jnp.float32),
        valid=jnp.concatenate(
            [jnp.ones((b, 1), bool), jnp.zeros((b, w - 1), bool)], axis=1
        ),
        phash=jnp.zeros((b, w), jnp.int32),
    )


def _prefix_hash(prefixes: jnp.ndarray, plen: jnp.ndarray) -> jnp.ndarray:
    """Rolling int32 hash over the valid prefix region. (..., U)->(...)."""
    u = prefixes.shape[-1]
    h = jnp.zeros(prefixes.shape[:-1], jnp.int32)
    for i in range(u):
        tok = prefixes[..., i]
        live = i < plen
        h = jnp.where(live, h * _HASH_MULT + (tok + 2), h)
    return h


@functools.partial(
    jax.jit,
    static_argnames=(
        "score_beam", "path_beam", "max_prefix", "prob_threshold",
    ),
)
def batched_ctc_prefix_beam_search(
    probs: jnp.ndarray,
    lengths: jnp.ndarray,
    tokenset_mask: Optional[jnp.ndarray] = None,
    score_beam: int = 3,
    path_beam: int = 20,
    max_prefix: int = 32,
    prob_threshold: float = 0.05,
):
    """probs: (B, T, V) softmaxed; lengths: (B,).

    tokenset_mask: optional (V,) bool — tokens allowed by the keyword
    set (include blank).  Returns a dict of arrays sorted best-first:
    prefixes (B, W, U), plen (B, W), score (B, W) = pb+pnb,
    node_frame/node_prob (B, W, U)."""
    b, t_max, v = probs.shape
    w = path_beam
    u = max_prefix
    k = score_beam

    state = _init_state(b, w, u)

    def step(t, state):
        return beam_step(
            state,
            probs[:, t, :],
            jnp.broadcast_to(jnp.int32(t), (b,)),
            t < lengths,
            tokenset_mask,
            score_beam=k,
            prob_threshold=prob_threshold,
        )

    state = jax.lax.fori_loop(0, t_max, step, state)
    score = state.pb + state.pnb
    order = jnp.argsort(-score, axis=1)

    def g(arr):
        return jnp.take_along_axis(
            arr, order.reshape(b, w, *([1] * (arr.ndim - 2))), axis=1
        )

    return {
        "prefixes": g(state.prefixes),
        "plen": jnp.take_along_axis(state.plen, order, axis=1),
        "score": jnp.take_along_axis(score, order, axis=1),
        "node_frame": g(state.node_frame),
        "node_prob": g(state.node_prob),
        "valid": jnp.take_along_axis(state.valid, order, axis=1),
    }


def beam_step(
    state: BeamState,
    p_t: jnp.ndarray,
    frame_idx: jnp.ndarray,
    live: jnp.ndarray,
    tokenset_mask: Optional[jnp.ndarray] = None,
    *,
    score_beam: int = 3,
    prob_threshold: float = 0.05,
) -> BeamState:
    """One frame-synchronous prefix-beam update (traceable).

    p_t: (B, V) softmaxed posteriors for this frame; frame_idx: (B,)
    int32 absolute frame index stamped into node tracks (streaming
    callers pass per-stream offsets); live: (B,) bool — rows with
    live=False keep their state bit-identical (the empty-filter rule is
    ANDed in internally). Rows come out sorted best-first by pb+pnb.
    """
    b, w, u = state.prefixes.shape
    k = score_beam
    t = frame_idx.reshape(b, 1, 1)

    topv, topi = jax.lax.top_k(p_t, k)  # (B, K)
    keep = topv > prob_threshold
    if tokenset_mask is not None:
        keep = keep & tokenset_mask[topi]
    any_kept = jnp.any(keep, axis=1)  # (B,)

    blank_in = jnp.any((topi == 0) & keep, axis=1)  # (B,)
    p_blank = p_t[:, 0]

    last = jnp.where(
        state.plen > 0,
        jnp.take_along_axis(
            state.prefixes,
            jnp.maximum(state.plen - 1, 0)[..., None],
            axis=2,
        )[..., 0],
        -1,
    )  # (B, W)
    p_last = jnp.take_along_axis(
        p_t, jnp.maximum(last, 0).reshape(b, w), axis=1
    )
    # last token passes the filter this frame?
    last_kept = jnp.any(
        (topi[:, None, :] == jnp.maximum(last, 0)[..., None])
        & keep[:, None, :],
        axis=2,
    ) & (last >= 0)

    total = state.pb + state.pnb

    # ---- candidate 0 per beam: "stay" (blank + repeat-collapse)
    stay_pb = jnp.where(blank_in[:, None], total * p_blank[:, None], 0.0)
    stay_pnb = jnp.where(last_kept, state.pnb * p_last, 0.0)
    # node update on repeat-collapse: last node best frame/prob
    lidx = jnp.maximum(state.plen - 1, 0)
    old_np = jnp.take_along_axis(
        state.node_prob, lidx[..., None], axis=2
    )[..., 0]
    upd = last_kept & (p_last > old_np) & (state.pnb > 1e-6)
    stay_node_prob = jnp.where(
        upd[..., None]
        & (jnp.arange(u)[None, None, :] == lidx[..., None]),
        p_last[..., None],
        state.node_prob,
    )
    stay_node_frame = jnp.where(
        upd[..., None]
        & (jnp.arange(u)[None, None, :] == lidx[..., None]),
        t,
        state.node_frame,
    )
    stay_valid = state.valid & (stay_pb + stay_pnb > 0)

    # ---- candidates 1..K per beam: extend with topk token s
    s_tok = topi[:, None, :]  # (B, 1, K)
    s_prob = topv[:, None, :]
    s_ok = keep[:, None, :] & (s_tok != 0)  # (B, 1, K)
    is_rep = s_tok == last[..., None]  # (B, W, K)
    ext_pnb = jnp.where(
        is_rep,
        state.pb[..., None] * s_prob,
        total[..., None] * s_prob,
    )  # (B, W, K)
    can_ext = (
        s_ok
        & state.valid[..., None]
        & (state.plen[..., None] < u)
        & (ext_pnb > 0)
    )
    # appended prefix arrays (B, W, K, U)
    pos = jnp.arange(u)[None, None, None, :]
    at_end = pos == state.plen[..., None, None]
    ext_prefixes = jnp.where(
        at_end,
        jnp.broadcast_to(s_tok[..., None], (b, w, k, u)),
        state.prefixes[:, :, None, :],
    )
    ext_node_tok = jnp.where(
        at_end,
        jnp.broadcast_to(s_tok[..., None], (b, w, k, u)),
        state.node_tok[:, :, None, :],
    )
    ext_node_frame = jnp.where(
        at_end,
        t[..., None],
        jnp.broadcast_to(state.node_frame[:, :, None, :], (b, w, k, u)),
    )
    ext_node_prob = jnp.where(
        at_end,
        jnp.broadcast_to(s_prob[..., None], (b, w, k, u)),
        state.node_prob[:, :, None, :],
    )
    ext_plen = jnp.broadcast_to(state.plen[..., None] + 1, (b, w, k))

    # ---- flatten candidates: stay (W) + extend (W*K)
    n_cand = w * (k + 1)

    def flat(stay, ext):
        return jnp.concatenate(
            [stay.reshape(b, w, *stay.shape[2:]),
             ext.reshape(b, w * k, *ext.shape[3:])],
            axis=1,
        )

    c_prefix = flat(state.prefixes, ext_prefixes)
    c_plen = jnp.concatenate(
        [state.plen, ext_plen.reshape(b, w * k)], axis=1
    )
    c_pb = jnp.concatenate(
        [stay_pb, jnp.zeros((b, w * k))], axis=1
    )
    c_pnb = jnp.concatenate(
        [stay_pnb, ext_pnb.reshape(b, w * k)], axis=1
    )
    c_ntok = flat(state.node_tok, ext_node_tok)
    c_nframe = flat(stay_node_frame, ext_node_frame)
    c_nprob = flat(stay_node_prob, ext_node_prob)
    c_valid = jnp.concatenate(
        [stay_valid, can_ext.reshape(b, w * k)], axis=1
    )

    # invalid candidates carry no mass
    c_pb = jnp.where(c_valid, c_pb, 0.0)
    c_pnb = jnp.where(c_valid, c_pnb, 0.0)

    # ---- merge identical prefixes: hash sort + segment sums.
    # Hashes are carried incrementally in the state (recomputing
    # over (..., U) per frame made the compiled step huge).
    ext_hash = state.phash[..., None] * _HASH_MULT + (
        jnp.broadcast_to(s_tok, (b, w, k)) + 2
    )
    c_hash = jnp.concatenate(
        [state.phash, ext_hash.reshape(b, w * k)], axis=1
    )
    h = c_hash
    h = jnp.where(
        c_valid, h, jnp.int32(-2147483648) + jnp.arange(n_cand)[None, :]
    )
    order = jnp.argsort(h, axis=1)
    hs = jnp.take_along_axis(h, order, axis=1)
    pbs = jnp.take_along_axis(c_pb, order, axis=1)
    pnbs = jnp.take_along_axis(c_pnb, order, axis=1)
    new_seg = jnp.concatenate(
        [jnp.ones((b, 1), bool), hs[:, 1:] != hs[:, :-1]], axis=1
    )
    seg_id = jnp.cumsum(new_seg, axis=1) - 1  # (B, n_cand)
    pb_sum = jax.vmap(
        lambda vals, seg: jax.ops.segment_sum(
            vals, seg, num_segments=n_cand
        )
    )(pbs, seg_id)
    pnb_sum = jax.vmap(
        lambda vals, seg: jax.ops.segment_sum(
            vals, seg, num_segments=n_cand
        )
    )(pnbs, seg_id)
    # representative candidate per segment: the max-pnb member
    # (its node track wins); ties resolve to the lowest index.
    sorted_idx = jnp.broadcast_to(
        jnp.arange(n_cand)[None, :], (b, n_cand)
    )
    segmax = jax.vmap(
        lambda vals, seg: jax.ops.segment_max(
            vals, seg, num_segments=n_cand
        )
    )(pnbs, seg_id)
    best_here = pnbs >= jnp.take_along_axis(segmax, seg_id, axis=1) - 1e-12
    rep = jax.vmap(
        lambda vals, seg: jax.ops.segment_min(
            vals, seg, num_segments=n_cand
        )
    )(jnp.where(best_here, sorted_idx, n_cand), seg_id)
    rep = jnp.minimum(rep, n_cand - 1)

    seg_count = seg_id[:, -1] + 1  # (B,)
    seg_pos = jnp.arange(n_cand)[None, :]
    seg_valid = seg_pos < seg_count[:, None]
    score = jnp.where(seg_valid, pb_sum + pnb_sum, -1.0)

    # top-W segments by score
    top_score, top_seg = jax.lax.top_k(score, w)  # (B, W)
    rep_sorted = jnp.take_along_axis(rep, top_seg, axis=1)  # (B, W)
    # rep indexes into the SORTED candidate order -> original index
    orig = jnp.take_along_axis(order, rep_sorted, axis=1)  # (B, W)

    def gather(arr):
        return jnp.take_along_axis(
            arr, orig.reshape(b, w, *([1] * (arr.ndim - 2))), axis=1
        )

    new_state = BeamState(
        prefixes=gather(c_prefix),
        plen=jnp.take_along_axis(c_plen, orig, axis=1),
        pb=jnp.take_along_axis(pb_sum, top_seg, axis=1),
        pnb=jnp.take_along_axis(pnb_sum, top_seg, axis=1),
        node_tok=gather(c_ntok),
        node_frame=gather(c_nframe),
        node_prob=gather(c_nprob),
        valid=top_score > 0,
        phash=jnp.take_along_axis(c_hash, orig, axis=1),
    )
    # dead rows or frames with empty filter: unchanged
    frame_live = live & any_kept  # (B,)

    def sel(new, old):
        shape = (b,) + (1,) * (new.ndim - 1)
        return jnp.where(frame_live.reshape(shape), new, old)

    return jax.tree_util.tree_map(sel, new_state, state)


def hyps_from_arrays(result, i):
    """Convert utterance i's arrays to host hypothesis tuples
    [(prefix_tuple, score, nodes)] compatible with the host decoder."""
    out = []
    plen = result["plen"][i]
    for wi in range(len(plen)):
        if not bool(result["valid"][i][wi]):
            continue
        n = int(plen[wi])
        prefix = tuple(int(x) for x in result["prefixes"][i][wi][:n])
        nodes = [
            dict(
                token=int(result["prefixes"][i][wi][j]),
                frame=int(result["node_frame"][i][wi][j]),
                prob=float(result["node_prob"][i][wi][j]),
            )
            for j in range(n)
        ]
        out.append((prefix, float(result["score"][i][wi]), nodes))
    return out
