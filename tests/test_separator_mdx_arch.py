"""ONNX-executor op coverage vs the real MDX-Net architecture.

The identity-model test in test_separator.py proves the STFT/chunk
plumbing; this file proves the *executor* handles the op set a real
Kim_Vocal_2-family graph exports to. We build a miniature
Conv_TDF_net_trim (the published kuielab MDX-Net v2 separator
architecture the UVR/audio-separator registry ships Kim_Vocal_2 as;
the reference loads it through the audio-separator package,
reference src/dataset/audio_processor.py:56-70), export it with
torch.onnx (a real toolchain-produced graph: Conv / ConvTranspose /
BatchNormalization / InstanceNormalization+Reshape (GroupNorm) /
MatMul+Add (Linear) / Relu / Transpose / Mul-skips), and parity-test
OnnxRunner against the torch module, then drive the same .onnx through
MDXVocalSeparator end-to-end.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402


def _export_onnx(model, example, path):
    """torch.onnx legacy export without the `onnx` pip package.

    The torchscript exporter only imports `onnx` inside
    _add_onnxscript_fn, which is a no-op when the graph contains no
    custom onnxscript functions (true for any plain nn.Module); patch
    it to identity so export works in this image.
    """
    try:
        from torch.onnx._internal.torchscript_exporter import (
            onnx_proto_utils,
        )
    except ImportError:
        pytest.skip("torchscript ONNX exporter internals moved; skip")

    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = lambda b, c: b
    try:
        torch.onnx.export(model, example, path, opset_version=13, dynamo=False)
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig


class ConvTDF(nn.Module):
    """One TFC-TDF block: l conv(+GN+ReLU) layers, plus a residual
    frequency-bottleneck MLP (the TDF) over the last axis."""

    def __init__(self, c, l, f, k, bn):
        super().__init__()
        self.H = nn.ModuleList(
            nn.Sequential(
                nn.Conv2d(c, c, k, padding=k // 2),
                nn.GroupNorm(2, c),
                nn.ReLU(),
            )
            for _ in range(l)
        )
        self.tdf = nn.Sequential(
            nn.Linear(f, f // bn),
            nn.GroupNorm(2, c),
            nn.ReLU(),
            nn.Linear(f // bn, f),
            nn.GroupNorm(2, c),
            nn.ReLU(),
        )

    def forward(self, x):
        for h in self.H:
            x = h(x)
        return x + self.tdf(x)


class MiniConvTDFNetTrim(nn.Module):
    """Miniature Conv_TDF_net_trim: 1x1 stem, n down/up scales with
    BatchNorm'd (transposed) strided convs, multiplicative skips, TDF
    blocks throughout, 1x1 head back to 4 re/im channels."""

    def __init__(self, dim_f=16, g=4, n=2, l=1, k=3, bn=2):
        super().__init__()
        self.n = n
        self.first_conv = nn.Sequential(
            nn.Conv2d(4, g, 1), nn.BatchNorm2d(g), nn.ReLU()
        )
        c, f = g, dim_f
        self.ds_dense, self.ds = nn.ModuleList(), nn.ModuleList()
        for _ in range(n):
            self.ds_dense.append(ConvTDF(c, l, f, k, bn))
            self.ds.append(
                nn.Sequential(
                    nn.Conv2d(c, c + g, 2, stride=2),
                    nn.BatchNorm2d(c + g),
                    nn.ReLU(),
                )
            )
            c += g
            f //= 2
        self.mid_dense = ConvTDF(c, l, f, k, bn)
        self.us, self.us_dense = nn.ModuleList(), nn.ModuleList()
        for _ in range(n):
            self.us.append(
                nn.Sequential(
                    nn.ConvTranspose2d(c, c - g, 2, stride=2),
                    nn.BatchNorm2d(c - g),
                    nn.ReLU(),
                )
            )
            c -= g
            f *= 2
            self.us_dense.append(ConvTDF(c, l, f, k, bn))
        self.final_conv = nn.Conv2d(c, 4, 1)

    def forward(self, x):
        x = self.first_conv(x)
        x = x.transpose(-1, -2)  # (B, C, T, F): Linear acts on F
        skips = []
        for i in range(self.n):
            x = self.ds_dense[i](x)
            skips.append(x)
            x = self.ds[i](x)
        x = self.mid_dense(x)
        for i in range(self.n):
            x = self.us[i](x)
            x = x * skips[-i - 1]
            x = self.us_dense[i](x)
        x = x.transpose(-1, -2)
        return self.final_conv(x)


@pytest.fixture(scope="module")
def mini_mdx(tmp_path_factory):
    torch.manual_seed(0)
    net = MiniConvTDFNetTrim(dim_f=16)
    net.eval()
    example = torch.randn(1, 4, 16, 8)
    path = str(tmp_path_factory.mktemp("mdx") / "mini_tfc_tdf.onnx")
    _export_onnx(net, example, path)
    return net, path


def test_onnx_exec_matches_torch_on_tfc_tdf_graph(mini_mdx):
    from mmgt_tpu.utils.onnx_exec import OnnxRunner

    net, path = mini_mdx
    run = OnnxRunner.from_file(path)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 4, 16, 8)).astype(np.float32)
    (got,) = run(x).values()
    want = net(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def test_separator_runs_real_conv_graph_end_to_end(mini_mdx):
    """MDXVocalSeparator drives the exported graph: n_fft/dim_f sized to
    the net (dim_f=16 bins, 2^3 frames), output finite + right shape."""
    from mmgt_tpu.data.separator import MDXVocalSeparator

    _, path = mini_mdx
    sep = MDXVocalSeparator(
        onnx_path=path, n_fft=64, hop=16, dim_f=16, dim_t=3, compensation=1.0
    )
    rng = np.random.default_rng(1)
    wav = rng.standard_normal(500).astype(np.float32) * 0.1
    out = sep(wav)
    assert out.shape == wav.shape
    assert np.isfinite(out).all()
