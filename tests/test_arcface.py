"""Numerical check of the JAX IResNet against an independent torch
construction of the same published architecture (insightface
arcface_torch/backbones/iresnet.py spec; module names match the public
checkpoint layout so the porter is exercised)."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import jax
import jax.numpy as jnp

from adaprompt_tpu.models import arcface as jaf


class TorchIBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.bn1 = tnn.BatchNorm2d(cin, eps=1e-5)
        self.conv1 = tnn.Conv2d(cin, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout, eps=1e-5)
        self.prelu = tnn.PReLU(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, stride, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(cout, eps=1e-5)
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout, eps=1e-5))
        else:
            self.downsample = None

    def forward(self, x):
        identity = x
        out = self.bn3(self.conv2(self.prelu(self.bn2(self.conv1(self.bn1(x))))))
        if self.downsample is not None:
            identity = self.downsample(x)
        return out + identity


class TorchIResNet(tnn.Module):
    def __init__(self, layers, planes, input_size, num_features=512):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 3, 1, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(64, eps=1e-5)
        self.prelu = tnn.PReLU(64)
        cin = 64
        for i, (n, cout) in enumerate(zip(layers, planes), start=1):
            blocks = [TorchIBasicBlock(cin, cout, 2)]
            cin = cout
            blocks += [TorchIBasicBlock(cin, cout, 1) for _ in range(n - 1)]
            setattr(self, f"layer{i}", tnn.Sequential(*blocks))
        self.bn2 = tnn.BatchNorm2d(planes[-1], eps=1e-5)
        sp = input_size // 16
        self.fc = tnn.Linear(planes[-1] * sp * sp, num_features)
        self.features = tnn.BatchNorm1d(num_features, eps=1e-5)

    def forward(self, x):
        x = self.prelu(self.bn1(self.conv1(x)))
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
        x = self.bn2(x)
        x = torch.flatten(x, 1)
        return self.features(self.fc(x))


def test_iresnet_parity():
    torch.manual_seed(0)
    layers, planes = (2, 2, 2, 2), (8, 16, 32, 64)
    ref = TorchIResNet(layers, planes, input_size=32, num_features=64).eval()
    # randomize BN running stats so folding is actually tested
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm1d)):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    cfg = jaf.IResNetConfig(layers=layers, planes=planes, num_features=64,
                            input_size=32)
    params = jaf.from_torch(ref.state_dict(), cfg)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()
    got = jaf.forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)), cfg)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


def test_full_size_shapes():
    cfg = jaf.IRESNET100
    params = jaf.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 112, 112, 3))
    emb = jaf.forward(params, x, cfg)
    assert emb.shape == (1, 512)


def test_cosine_similarity():
    a = jnp.asarray([[3.0, 0.0], [0.0, 2.0]])
    b = jnp.asarray([[1.0, 0.0], [0.0, -5.0]])
    np.testing.assert_allclose(np.asarray(jaf.cosine_similarity(a, b)),
                               [1.0, -1.0], atol=1e-6)
