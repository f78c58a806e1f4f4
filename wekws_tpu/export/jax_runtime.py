"""JAX executor for exported graph artifacts — the TPU serving path
for static-int8 models (r4 verdict item 6).

Same op semantics and cache layout as the numpy interpreter
(export/np_runtime.py) and the C++ graph runtime, but batched over
streams and jitted, so a calibrated int8 artifact
(bin/static_quantize.py analog, reference static_quantize.py:57-130)
can serve ON THE TPU:

* activations quantize at each static-quant op boundary with the
  calibrated (in_scale, in_zp) — ``clip(rint(x/s) + zp)`` exactly as
  the np/C++ paths;
* matmul-type ops (dense, conv taps) run the MXU's native int8 path:
  ``lax.dot_general(int8, int8, preferred_element_type=int32)`` on
  the UNSHIFTED quantized operands, with the zero-point folded in
  afterwards as ``- zp * colsum(W)`` (exact integer identity:
  (x-zp)@W = x@W - zp*colsum(W)) — so results are bit-identical to
  the np interpreter's shifted-int32 formulation;
* per-tap dw_conv / fsmn_block products stay elementwise int32 (VPU);
* the identity path of fsmn_block and everything non-matmul stays f32,
  matching np_runtime.

``forward`` is (B, T, D)-batched: one jitted dispatch serves B
streams, state is a list of (B, len, dim) caches; chunked calls equal
one full-utterance call (the export streaming contract).
"""

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wekws_tpu.export.graph import load_artifact


def _act(x, act: str):
    if act == "relu":
        return jnp.maximum(x, 0.0)
    if act == "sigmoid":
        return jax.nn.sigmoid(x)
    return x


def _quantize_i8(x, scale: float, zp: int):
    """f32 -> int8 in the zero-point-SHIFTED domain [-128, 127].

    jnp.round rounds half-to-even like np.rint / C++ nearbyint, so
    the three runtimes quantize identically."""
    q = jnp.clip(jnp.round(x / jnp.float32(scale)) + zp, -128, 127)
    return q.astype(jnp.int8)


class JaxGraphRuntime:
    """Batched jitted executor over a graph artifact (float or int8)."""

    def __init__(self, model_dir: str):
        import os

        with_quant = os.path.exists(
            os.path.join(model_dir, "weights_int8.bin")
        )
        if with_quant:
            from wekws_tpu.export.quantize import load_quantized

            self.artifact, self._flat, self._int8 = load_quantized(
                model_dir)
        else:
            self.artifact, self._flat = load_artifact(model_dir)
            self._int8 = None
        self.ops = self.artifact["ops"]
        self.caches = self.artifact["caches"]
        self.meta = self.artifact["meta"]
        # materialize per-entry device weights once
        self._w: Dict[int, Dict[str, object]] = {}
        for i, entry in enumerate(self.ops):
            slot: Dict[str, object] = {}
            for key, ref in entry.items():
                if not isinstance(ref, dict):
                    continue
                if "int8" in ref:
                    q, scale = self._qtensor(ref)
                    slot[key] = ("q", jnp.asarray(q),
                                 jnp.asarray(scale),
                                 jnp.asarray(
                                     q.astype(np.int32).sum(
                                         axis=tuple(
                                             range(q.ndim - 1))),
                                     jnp.int32))
                elif "offset" in ref:
                    slot[key] = ("f", jnp.asarray(self._tensor(ref)))
            self._w[i] = slot
        self._fwd = jax.jit(self._forward_impl)

    # -- host-side weight access ---------------------------------------
    def _qtensor(self, ref):
        qr, sr = ref["int8"], ref["scale"]
        size = int(np.prod(qr["shape"]))
        q = self._int8[qr["offset"]: qr["offset"] + size].reshape(
            qr["shape"])
        scale = self._flat[
            sr["offset"]: sr["offset"] + int(np.prod(sr["shape"]))
        ].reshape(sr["shape"])
        return q, scale

    def _tensor(self, ref):
        if "int8" in ref:
            q, scale = self._qtensor(ref)
            return q.astype(np.float32) * scale
        size = int(np.prod(ref["shape"])) if ref["shape"] else 1
        return self._flat[ref["offset"]: ref["offset"] + size].reshape(
            ref["shape"])

    def _wf(self, i, key):
        """Float weight for entry i (dequantized if stored int8)."""
        slot = self._w[i][key]
        if slot[0] == "f":
            return slot[1]
        _, q, scale, _ = slot
        return q.astype(jnp.float32) * scale

    # -- state ----------------------------------------------------------
    def init_state(self, batch: int) -> List[jnp.ndarray]:
        return [
            jnp.zeros((batch, c["len"], c["dim"]), jnp.float32)
            for c in self.caches
        ]

    # -- execution -------------------------------------------------------
    def _int8_dot(self, ext, i, key, attrs, taps=None, dilation=1,
                  t_out=None):
        """Quantize ``ext`` and contract against the int8 weight.

        taps=None: plain dense (x @ W).  Otherwise a tap loop over the
        leading kernel axis of W with the given dilation/stride."""
        s = float(attrs["in_scale"])
        zp = int(attrs["in_zp"])
        _, q, scale, colsum = self._w[i][key]
        xq = _quantize_i8(ext, s, zp)
        if taps is None:
            acc = jax.lax.dot_general(
                xq, q, (((xq.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            nsum = colsum  # (Cout,)
        else:
            acc = None
            for tap in range(taps):
                sl = jax.lax.slice_in_dim(
                    xq, tap * dilation, tap * dilation + t_out, axis=1)
                if q.ndim == 3:  # conv: (K, C, Cout)
                    part = jax.lax.dot_general(
                        sl, q[tap], (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                else:  # dw taps: (K, C) elementwise
                    part = sl.astype(jnp.int32) * q[tap].astype(
                        jnp.int32)
                acc = part if acc is None else acc + part
            nsum = colsum
        # zero-point fold: (x_q - zp) . W  ==  x_q . W - zp * colsum(W)
        acc = acc - jnp.int32(zp) * nsum
        return acc.astype(jnp.float32) * (jnp.float32(s) * scale)

    def _forward_impl(self, feats, state):
        state = list(state)
        bufs: Dict[int, jnp.ndarray] = {0: feats.astype(jnp.float32)}
        for i, entry in enumerate(self.ops):
            op = entry["op"]
            attrs = entry.get("attrs", {})
            x = bufs[entry["inputs"][0]]
            int8_exec = (
                "in_scale" in attrs
                and isinstance(self._w[i].get("W"), tuple)
                and self._w[i].get("W", ("f",))[0] == "q"
            )
            if op == "cmvn":
                y = (x - self._wf(i, "mean")) * self._wf(i, "istd")
            elif op == "dense":
                if int8_exec:
                    y = self._int8_dot(x, i, "W", attrs)
                else:
                    y = x @ self._wf(i, "W")
                if "b_" in entry:
                    y = y + self._wf(i, "b_")
                y = _act(y, attrs.get("act", "none"))
            elif op in ("conv", "dw_conv"):
                cid = attrs["cache"]
                dilation = attrs["dilation"]
                k = self._w[i]["W"][1].shape[0]  # taps (q or f slot)
                pad = (k - 1) * dilation
                ext = jnp.concatenate([state[cid], x], axis=1)
                t_ext = ext.shape[1]
                state[cid] = (
                    jax.lax.slice_in_dim(ext, t_ext - pad, t_ext, axis=1)
                    if pad else ext[:, :0])
                t_out = t_ext - pad
                if int8_exec:
                    y = self._int8_dot(
                        ext, i, "W", attrs,
                        taps=k, dilation=dilation, t_out=t_out)
                else:
                    w = self._wf(i, "W")
                    y = None
                    for tap in range(k):
                        sl = jax.lax.slice_in_dim(
                            ext, tap * dilation, tap * dilation + t_out,
                            axis=1)
                        part = (sl @ w[tap] if op == "conv"
                                else sl * w[tap])
                        y = part if y is None else y + part
                if "b_" in entry:
                    y = y + self._wf(i, "b_")
                y = _act(y, attrs.get("act", "none"))
            elif op == "fsmn_block":
                y, state = self._fsmn_block(i, entry, attrs, x, state)
            elif op == "gru":
                y, state = self._gru(i, entry, attrs, x, state)
            elif op == "add":
                y = x + bufs[entry["inputs"][1]]
            elif op == "relu":
                y = jnp.maximum(x, 0.0)
            elif op == "sigmoid":
                y = jax.nn.sigmoid(x)
            elif op == "softmax":
                y = jax.nn.softmax(x, axis=-1)
            elif op == "mean_pool":
                y = x.mean(axis=1, keepdims=True)
            elif op == "last_frame":
                y = x[:, -1:, :]
            else:
                raise ValueError(f"unknown op {op}")
            bufs[entry["out"]] = y
        return bufs[self.meta["output"]], state

    def _fsmn_block(self, i, entry, attrs, x, state):
        lorder, rorder = attrs["lorder"], attrs["rorder"]
        lstride, rstride = attrs["lstride"], attrs["rstride"]
        cid = attrs["cache"]
        pad = (lorder - 1) * lstride + rorder * rstride
        ext = jnp.concatenate([state[cid], x], axis=1)
        t_ext = ext.shape[1]
        state[cid] = (
            jax.lax.slice_in_dim(ext, t_ext - pad, t_ext, axis=1)
            if pad else ext[:, :0])
        t_out = t_ext - pad
        rspan = rorder * rstride
        start = (lorder - 1) * lstride
        y = jax.lax.slice_in_dim(ext, start, start + t_out, axis=1)
        int8_exec = (
            "in_scale" in attrs
            and isinstance(self._w[i].get("Wl"), tuple)
            and self._w[i]["Wl"][0] == "q"
        )
        if int8_exec:
            y = y + self._int8_dot(
                ext, i, "Wl", attrs,
                taps=lorder, dilation=lstride, t_out=t_out)
            if "Wr" in self._w[i] and rorder > 0:
                base = t_ext - (t_out + rspan) + rstride
                s_, zp = float(attrs["in_scale"]), int(attrs["in_zp"])
                _, qr, rscale, rcolsum = self._w[i]["Wr"]
                xq = _quantize_i8(ext, s_, zp)
                acc = None
                for tap in range(rorder):
                    o = base + tap * rstride
                    sl = jax.lax.slice_in_dim(xq, o, o + t_out, axis=1)
                    part = sl.astype(jnp.int32) * qr[tap].astype(
                        jnp.int32)
                    acc = part if acc is None else acc + part
                acc = acc - jnp.int32(zp) * rcolsum
                y = y + acc.astype(jnp.float32) * (
                    jnp.float32(s_) * rscale)
            return y, state
        wl = self._wf(i, "Wl")
        for tap in range(lorder):
            sl = jax.lax.slice_in_dim(
                ext, tap * lstride, tap * lstride + t_out, axis=1)
            y = y + sl * wl[tap]
        if "Wr" in self._w[i] and rorder > 0:
            wr = self._wf(i, "Wr")
            base = t_ext - (t_out + rspan) + rstride
            for tap in range(rorder):
                o = base + tap * rstride
                sl = jax.lax.slice_in_dim(ext, o, o + t_out, axis=1)
                y = y + sl * wr[tap]
        return y, state

    def _gru(self, i, entry, attrs, x, state):
        cid = attrs["cache"]
        h0 = state[cid][:, 0, :]
        wih, bih = self._wf(i, "Wih"), self._wf(i, "bih")
        whh, bhh = self._wf(i, "Whh"), self._wf(i, "bhh")
        hdim = attrs["hidden"]

        def step(h, xt):
            gi = xt @ wih + bih
            gh = h @ whh + bhh
            xr, xz, xn = jnp.split(gi, 3, axis=-1)
            hr, hz, hn = jnp.split(gh, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h = (1.0 - z) * n + z * h
            return h, h

        hT, out = jax.lax.scan(step, h0, jnp.swapaxes(x, 0, 1))
        state[cid] = hT[:, None, :]
        assert out.shape[-1] == hdim
        return jnp.swapaxes(out, 0, 1), state

    def forward(
        self,
        feats: np.ndarray,
        state: Optional[List[jnp.ndarray]] = None,
    ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        """(B, T, D) batched forward (a (T, D) input is auto-batched
        to B=1 and squeezed back)."""
        feats = jnp.asarray(feats, jnp.float32)
        squeeze = feats.ndim == 2
        if squeeze:
            feats = feats[None]
        if state is None:
            state = self.init_state(feats.shape[0])
        out, state = self._fwd(feats, state)
        if squeeze:
            out = out[0]
        return out, state


class ArtifactModelAdapter:
    """Duck-types the ``(model, variables)`` pair the batched serving
    engines expect (``model.apply(variables, feats, cache,
    softmax=...) -> (probs, cache)`` + ``model.init_cache(B)``),
    backed by a JaxGraphRuntime — so ``BatchKeywordSpotter`` /
    ``bin/serve.py`` can serve an exported artifact (float OR
    static-int8) directly instead of a flax checkpoint.

    The artifact weights close over the jitted serving step as
    constants (they are KB-to-MB scale — far under the tunnel's
    ~100 MB closure limit) and the cache is the runtime's state list,
    which the engines treat as an opaque pytree."""

    def __init__(self, runtime: "JaxGraphRuntime"):
        self.rt = runtime
        self._has_softmax = any(
            e["op"] == "softmax" for e in runtime.ops)

    def init_cache(self, batch: int):
        return self.rt.init_state(batch)

    def apply(self, variables, feats, cache, softmax: bool = False):
        del variables  # weights live inside the runtime
        out, state = self.rt._forward_impl(feats, list(cache))
        if softmax and not self._has_softmax:
            out = jax.nn.softmax(out, axis=-1)
        return out, state


def load_artifact_model(model_dir: str):
    """(model-like, variables) from an exported artifact directory —
    the artifact-backed twin of runtime.keyword_spotter
    .load_spotter_model."""
    return ArtifactModelAdapter(JaxGraphRuntime(model_dir)), {}
