"""Torch-checkpoint importer: converted weights must reproduce the
reference model's forward exactly.

Ground truth is computed with torch modules built HERE from the
documented reference math (causal left padding, dw->BN->pw blocks,
multi-scale stack sums, FSMN memory taps, torch GRU) under the
reference's state_dict naming scheme — so the test validates both the
name mapping and every tensor-layout permutation in
wekws_tpu/tools/import_torch.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")  # torch is an optional dependency
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from wekws_tpu.models import init_model
from wekws_tpu.tools.import_torch import import_torch_checkpoint

torch.manual_seed(0)


def randomize_bn(bn):
    with torch.no_grad():
        bn.weight.copy_(torch.rand_like(bn.weight) + 0.5)
        bn.bias.copy_(torch.randn_like(bn.bias) * 0.1)
        bn.running_mean.copy_(torch.randn_like(bn.running_mean) * 0.1)
        bn.running_var.copy_(torch.rand_like(bn.running_var) + 0.5)


class RefDSDilatedConv1d(nn.Module):
    def __init__(self, cin, cout, k, dilation):
        super().__init__()
        self.conv = nn.Conv1d(cin, cin, k, dilation=dilation, groups=cin)
        self.bn = nn.BatchNorm1d(cin)
        self.pointwise = nn.Conv1d(cin, cout, 1)

    def forward(self, x):
        return self.pointwise(self.bn(self.conv(x)))


class RefTCNBlock(nn.Module):
    def __init__(self, cin, cres, k, dilation):
        super().__init__()
        self.padding = (k - 1) * dilation
        self.conv1 = RefDSDilatedConv1d(cin, cres, k, dilation)
        self.bn1 = nn.BatchNorm1d(cres)
        self.conv2 = nn.Conv1d(cres, cres, 1)
        self.bn2 = nn.BatchNorm1d(cres)

    def forward(self, x):  # (B, C, T), causal
        y = F.pad(x, (self.padding, 0))
        y = F.relu(self.bn1(self.conv1(y)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + x)


class RefTCNStack(nn.Module):
    def __init__(self, c, stack_size, k):
        super().__init__()
        self.res_blocks = nn.ModuleList(
            [RefTCNBlock(c, c, k, 2 ** i) for i in range(stack_size)]
        )

    def forward(self, x):
        for b in self.res_blocks:
            x = b(x)
        return x


class RefMDTC(nn.Module):
    def __init__(self, num_stack, stack_size, c, k):
        super().__init__()
        self.preprocessor = RefTCNBlock(c, c, k, 1)
        self.blocks = nn.ModuleList(
            [RefTCNStack(c, stack_size, k) for _ in range(num_stack)]
        )

    def forward(self, x):  # (B, T, C) -> (B, T, C)
        y = F.relu(self.preprocessor(x.transpose(1, 2)))
        out = None
        for stack in self.blocks:
            y = stack(y)
            out = y if out is None else out + y
        return out.transpose(1, 2)


class RefKws(nn.Module):
    """preprocessing Linear -> backbone -> LinearClassifier -> sigmoid,
    reference attribute naming."""

    def __init__(self, idim, hdim, odim, backbone):
        super().__init__()
        self.preprocessing = nn.Module()
        self.preprocessing.out = nn.Sequential(
            nn.Linear(idim, hdim), nn.ReLU()
        )
        self.backbone = backbone
        self.classifier = nn.Module()
        self.classifier.linear = nn.Linear(hdim, odim)

    def forward(self, x):
        x = self.preprocessing.out(x)
        x = self.backbone(x)
        return torch.sigmoid(self.classifier.linear(x))


def _convert_and_apply(ref, model_conf, x):
    ref.eval()
    for m in ref.modules():
        if isinstance(m, nn.BatchNorm1d):
            randomize_bn(m)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    params, stats, cmvn = import_torch_checkpoint(
        ref.state_dict(), model_conf
    )
    assert cmvn is None
    model = init_model(model_conf)
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    got, _ = model.apply(variables, jnp.asarray(x))
    return np.asarray(got), want


def test_import_mdtc_matches_torch():
    conf = {
        "input_dim": 20, "output_dim": 2, "hidden_dim": 16,
        "preprocessing": {"type": "linear"},
        "backbone": {"type": "mdtc", "num_stack": 2, "stack_size": 2,
                     "kernel_size": 5, "hidden_dim": 16, "causal": True},
    }
    ref = RefKws(20, 16, 2, RefMDTC(2, 2, 16, 5))
    x = np.random.default_rng(0).standard_normal((2, 30, 20)).astype(
        np.float32
    )
    got, want = _convert_and_apply(ref, conf, x)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


class RefDsCnnBlock(nn.Module):
    def __init__(self, c, k, dilation):
        super().__init__()
        self.padding = (k - 1) * dilation
        self.cnn = nn.Sequential(
            nn.Conv1d(c, c, k, dilation=dilation, groups=c),
            nn.BatchNorm1d(c), nn.ReLU(),
            nn.Conv1d(c, c, 1), nn.BatchNorm1d(c), nn.ReLU(),
            nn.Dropout(0.0),
        )

    def forward(self, x):
        return self.cnn(F.pad(x, (self.padding, 0))) + x


class RefTCN(nn.Module):
    def __init__(self, num_layers, c, k):
        super().__init__()
        self.network = nn.ModuleList(
            [RefDsCnnBlock(c, k, 2 ** i) for i in range(num_layers)]
        )

    def forward(self, x):
        y = x.transpose(1, 2)
        for b in self.network:
            y = b(y)
        return y.transpose(1, 2)


def test_import_ds_tcn_matches_torch():
    conf = {
        "input_dim": 20, "output_dim": 1, "hidden_dim": 16,
        "preprocessing": {"type": "linear"},
        "backbone": {"type": "tcn", "ds": True, "num_layers": 3,
                     "kernel_size": 4, "dropout": 0.0},
    }
    ref = RefKws(20, 16, 1, RefTCN(3, 16, 4))
    x = np.random.default_rng(1).standard_normal((2, 25, 20)).astype(
        np.float32
    )
    got, want = _convert_and_apply(ref, conf, x)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_import_gru_matches_torch():
    from wekws_tpu.models.gru import GRU

    h, layers, t, b = 16, 2, 12, 3
    ref = nn.GRU(h, h, num_layers=layers, batch_first=True)
    x = np.random.default_rng(2).standard_normal((b, t, h)).astype(
        np.float32
    )
    with torch.no_grad():
        want, _ = ref(torch.from_numpy(x))
    sd = {f"backbone.{k}": v for k, v in ref.state_dict().items()}
    conf = {"backbone": {"type": "gru", "num_layers": layers},
            "preprocessing": {"type": "none"}}
    params, _, _ = import_torch_checkpoint(sd, conf)
    model = GRU(h, layers)
    got, _ = model.apply({"params": params["backbone"]}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), atol=2e-5, rtol=1e-4
    )


class RefFSMNBlock(nn.Module):
    """Documented reference memory-tap math (fsmn.py:214-253): causal
    pad, left taps via grouped conv over x_pad[:-rspan], identity from
    the (rorder-delayed) alignment, right taps one rstride ahead."""

    def __init__(self, dim, lorder, rorder):
        super().__init__()
        self.lorder, self.rorder = lorder, rorder
        self.conv_left = nn.Conv2d(
            dim, dim, (lorder, 1), groups=dim, bias=False
        )
        if rorder > 0:
            self.conv_right = nn.Conv2d(
                dim, dim, (rorder, 1), groups=dim, bias=False
            )

    def forward(self, x):  # (B, T, D)
        pad = (self.lorder - 1) + self.rorder
        xp = x.unsqueeze(1).permute(0, 3, 2, 1)  # (B, D, T, 1)
        x_pad = F.pad(xp, [0, 0, pad, 0])
        y_left = self.conv_left(x_pad[:, :, : -self.rorder or None, :])
        out = x_pad[:, :, self.lorder - 1 : -self.rorder or None, :] \
            + y_left
        if self.rorder > 0:
            y_right = x_pad[:, :, -(xp.size(2) + self.rorder) :, :]
            y_right = self.conv_right(y_right[:, :, 1:, :])
            out = out + y_right
        return out.permute(0, 3, 2, 1).squeeze(1)


class RefFSMN(nn.Module):
    def __init__(self, idim, adim, ldim, pdim, lorder, rorder, odim_a,
                 odim, layers):
        super().__init__()

        def affine(i, o):
            m = nn.Module()
            m.linear = nn.Linear(i, o)
            return m

        def lin(i, o):
            m = nn.Module()
            m.linear = nn.Linear(i, o, bias=False)
            return m

        self.in_linear1 = affine(idim, adim)
        self.in_linear2 = affine(adim, ldim)
        self.fsmn = nn.ModuleList([
            nn.Sequential(
                lin(ldim, pdim),
                RefFSMNBlock(pdim, lorder, rorder),
                affine(pdim, ldim),
            )
            for _ in range(layers)
        ])
        self.out_linear1 = affine(ldim, odim_a)
        self.out_linear2 = affine(odim_a, odim)

    def forward(self, x):
        x = self.in_linear2.linear(self.in_linear1.linear(x))
        x = F.relu(x)
        for layer in self.fsmn:
            x = layer[0].linear(x)
            x = layer[1](x)
            x = F.relu(layer[2].linear(x))
        return self.out_linear2.linear(self.out_linear1.linear(x))


def test_import_fsmn_matches_torch():
    conf = {
        "input_dim": 20, "output_dim": 8, "hidden_dim": 32,
        "preprocessing": {"type": "none"},
        "backbone": {"type": "fsmn", "input_affine_dim": 24,
                     "num_layers": 2, "linear_dim": 32, "proj_dim": 16,
                     "left_order": 4, "right_order": 2,
                     "left_stride": 1, "right_stride": 1,
                     "output_affine_dim": 24},
        "classifier": {"type": "identity", "dropout": 0.0},
        "activation": {"type": "identity"},
    }
    ref = RefFSMN(20, 24, 32, 16, 4, 2, 24, 8, 2)
    ref.eval()
    x = np.random.default_rng(3).standard_normal((2, 24, 20)).astype(
        np.float32
    )
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    sd = {f"backbone.{k}": v for k, v in ref.state_dict().items()}
    params, stats, _ = import_torch_checkpoint(sd, conf)
    model = init_model(conf)
    got, _ = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got), want, atol=2e-5, rtol=1e-4
    )


def test_import_cmvn_and_mlp_head():
    conf = {
        "input_dim": 20, "output_dim": 5, "hidden_dim": 16,
        "preprocessing": {"type": "linear"},
        "backbone": {"type": "tcn", "ds": True, "num_layers": 2,
                     "kernel_size": 4, "dropout": 0.0},
        "classifier": {"type": "global", "dropout": 0.0},
    }
    ref = RefKws(20, 16, 5, RefTCN(2, 16, 4))
    # reference 2-layer MLP head naming: classifier.classifier.{0,3}
    ref.classifier = nn.Module()
    ref.classifier.classifier = nn.Sequential(
        nn.Linear(16, 64), nn.ReLU(), nn.Dropout(0.0), nn.Linear(64, 5)
    )
    sd = dict(ref.state_dict())
    sd["global_cmvn.mean"] = torch.randn(20)
    sd["global_cmvn.istd"] = torch.rand(20) + 0.5
    params, stats, cmvn = import_torch_checkpoint(sd, conf)
    assert cmvn is not None and cmvn[0].shape == (20,)
    assert "mlp" in params["classifier"]
    model = init_model(dict(conf, cmvn={"mean": cmvn[0], "istd": cmvn[1]}))
    x = jnp.asarray(np.random.default_rng(4)
                    .standard_normal((2, 25, 20)).astype(np.float32))
    out, _ = model.apply({"params": params, "batch_stats": stats}, x)
    assert out.shape == (2, 5)
    assert bool(jnp.isfinite(out).all())
