"""Kaldi nnet1-text import/export for FSMN parameters.

Parity with the reference's ``to_kaldi_net`` / ``to_pytorch_net``
(/root/reference/wekws/model/fsmn.py:497-546): the network serializes
as <Nnet> AffineTransform x2, RectifiedLinear, then per layer
LinearTransform + <Fsmn> (left taps flipped oldest-first, right taps
in order) + AffineTransform + RectifiedLinear, the two output affines
and a <Softmax> tag.  Round-trip is the identity (tested).

Kaldi stores affine weights (out, in); flax Dense kernels are
(in, out) — transposed on both paths.
"""

from typing import Dict

import numpy as np


def _matrix(rows: np.ndarray) -> str:
    lines = []
    for i, row in enumerate(np.atleast_2d(rows)):
        prefix = "[ " if i == 0 else "  "
        lines.append(prefix + " ".join(f"{v:.7g}" for v in row))
    lines[-1] += " ]"
    return "\n".join(lines)


def _affine(name: str, kernel: np.ndarray, bias: np.ndarray = None) -> str:
    out_dim, in_dim = kernel.shape[1], kernel.shape[0]
    parts = [f"<{name}> {out_dim} {in_dim}"]
    if name == "AffineTransform":
        parts.append("<LearnRateCoef> 1 <BiasLearnRateCoef> 1 <MaxNorm> 0")
    else:
        parts.append("<LearnRateCoef> 1")
    parts.append(_matrix(np.asarray(kernel).T))
    if bias is not None:
        parts.append(_matrix(np.asarray(bias)[None, :]))
    return "\n".join(parts)


def fsmn_to_kaldi(module, params: Dict) -> str:
    """flax FSMN params -> Kaldi nnet text."""
    out = ["<Nnet>"]
    out.append(_affine("AffineTransform", params["in_linear1"]["kernel"],
                       params["in_linear1"]["bias"]))
    out.append(_affine("AffineTransform", params["in_linear2"]["kernel"],
                       params["in_linear2"]["bias"]))
    out.append(
        f"<RectifiedLinear> {module.linear_dim} {module.linear_dim}"
    )
    for i in range(module.fsmn_layers):
        out.append(_affine("LinearTransform",
                           params[f"layer_{i}_proj"]["kernel"]))
        fb = params[f"layer_{i}_fsmn"]
        d = module.proj_dim
        out.append(f"<Fsmn> {d} {d}")
        out.append(
            f"<LearnRateCoef> 1 <LOrder> {module.lorder} "
            f"<ROrder> {module.rorder} <LStride> {module.lstride} "
            f"<RStride> {module.rstride} <MaxNorm> 0"
        )
        left = np.asarray(fb["conv_left"]["kernel"])[:, 0, :]  # (lorder, D)
        out.append(_matrix(left[::-1]))  # oldest tap first
        if module.rorder > 0:
            right = np.asarray(fb["conv_right"]["kernel"])[:, 0, :]
            out.append(_matrix(right))
        out.append(_affine("AffineTransform",
                           params[f"layer_{i}_affine"]["kernel"],
                           params[f"layer_{i}_affine"]["bias"]))
        out.append(
            f"<RectifiedLinear> {module.linear_dim} {module.linear_dim}"
        )
    out.append(_affine("AffineTransform", params["out_linear1"]["kernel"],
                       params["out_linear1"]["bias"]))
    out.append(_affine("AffineTransform", params["out_linear2"]["kernel"],
                       params["out_linear2"]["bias"]))
    out.append(f"<Softmax> {module.output_dim} {module.output_dim}")
    out.append("</Nnet>")
    return "\n".join(out) + "\n"


class _Reader:
    def __init__(self, text: str):
        self.tokens = text.replace("[", " [ ").replace("]", " ] ").split()
        self.pos = 0

    def next(self) -> str:
        tok = self.tokens[self.pos]
        self.pos += 1
        return tok

    def expect(self, tok: str):
        got = self.next()
        assert got == tok, f"expected {tok}, got {got}"

    def skip_until(self, tok: str):
        while self.next() != tok:
            pass

    def matrix(self, rows: int, cols: int) -> np.ndarray:
        self.expect("[")
        vals = []
        while True:
            tok = self.next()
            if tok == "]":
                break
            vals.append(float(tok))
        arr = np.asarray(vals, np.float32)
        assert arr.size == rows * cols, (arr.size, rows, cols)
        return arr.reshape(rows, cols)


def fsmn_from_kaldi(module, text: str) -> Dict:
    """Kaldi nnet text -> flax FSMN params dict."""
    r = _Reader(text)
    r.expect("<Nnet>")

    def affine():
        r.expect("<AffineTransform>")
        out_dim, in_dim = int(r.next()), int(r.next())
        r.skip_until("<MaxNorm>")
        r.next()  # maxnorm value
        kernel = r.matrix(out_dim, in_dim).T
        bias = r.matrix(1, out_dim)[0]
        return {"kernel": kernel, "bias": bias}

    params: Dict = {}
    params["in_linear1"] = affine()
    params["in_linear2"] = affine()
    r.expect("<RectifiedLinear>")
    r.next(), r.next()
    for i in range(module.fsmn_layers):
        r.expect("<LinearTransform>")
        out_dim, in_dim = int(r.next()), int(r.next())
        r.expect("<LearnRateCoef>")
        r.next()
        params[f"layer_{i}_proj"] = {
            "kernel": r.matrix(out_dim, in_dim).T
        }
        r.expect("<Fsmn>")
        d = int(r.next())
        r.next()
        r.skip_until("<MaxNorm>")
        r.next()
        left = r.matrix(module.lorder, d)[::-1]  # back to newest-last
        block = {"conv_left": {"kernel": left[:, None, :].copy()}}
        if module.rorder > 0:
            right = r.matrix(module.rorder, d)
            block["conv_right"] = {"kernel": right[:, None, :].copy()}
        params[f"layer_{i}_fsmn"] = block
        params[f"layer_{i}_affine"] = affine()
        r.expect("<RectifiedLinear>")
        r.next(), r.next()
    params["out_linear1"] = affine()
    params["out_linear2"] = affine()
    r.expect("<Softmax>")
    return params
