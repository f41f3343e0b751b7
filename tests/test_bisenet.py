"""Numerical check of the JAX BiSeNet face parser against an independent
torch construction of the same published architecture (zllrunning
face-parsing.PyTorch model spec; module names match the `79999_iter.pth`
checkpoint layout so the porter is exercised)."""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F
import jax.numpy as jnp

from adaprompt_tpu.models import bisenet as jb


class ConvBNReLU(tnn.Module):
    def __init__(self, cin, cout, ks, stride, pad):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, ks, stride, pad, bias=False)
        self.bn = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class BasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        out = self.bn2(self.conv2(F.relu(self.bn1(self.conv1(x)))))
        idn = x if self.downsample is None else self.downsample(x)
        return F.relu(out + idn)


class Resnet18(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = tnn.Sequential(BasicBlock(64, 64, 1), BasicBlock(64, 64, 1))
        self.layer2 = tnn.Sequential(BasicBlock(64, 128, 2), BasicBlock(128, 128, 1))
        self.layer3 = tnn.Sequential(BasicBlock(128, 256, 2), BasicBlock(256, 256, 1))
        self.layer4 = tnn.Sequential(BasicBlock(256, 512, 2), BasicBlock(512, 512, 1))

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        f4 = self.layer1(x)
        f8 = self.layer2(f4)
        f16 = self.layer3(f8)
        f32 = self.layer4(f16)
        return f8, f16, f32


class ARM(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = ConvBNReLU(cin, cout, 3, 1, 1)
        self.conv_atten = tnn.Conv2d(cout, cout, 1, bias=False)
        self.bn_atten = tnn.BatchNorm2d(cout)

    def forward(self, x):
        feat = self.conv(x)
        atten = F.adaptive_avg_pool2d(feat, 1)
        atten = torch.sigmoid(self.bn_atten(self.conv_atten(atten)))
        return feat * atten


class ContextPath(tnn.Module):
    def __init__(self):
        super().__init__()
        self.resnet = Resnet18()
        self.arm16 = ARM(256, 128)
        self.arm32 = ARM(512, 128)
        self.conv_head32 = ConvBNReLU(128, 128, 3, 1, 1)
        self.conv_head16 = ConvBNReLU(128, 128, 3, 1, 1)
        self.conv_avg = ConvBNReLU(512, 128, 1, 1, 0)

    def forward(self, x):
        f8, f16, f32 = self.resnet(x)
        avg = self.conv_avg(F.adaptive_avg_pool2d(f32, 1))
        f32 = self.arm32(f32) + avg
        f32 = self.conv_head32(F.interpolate(f32, scale_factor=2, mode="nearest"))
        f16 = self.arm16(f16) + f32
        f16 = self.conv_head16(F.interpolate(f16, scale_factor=2, mode="nearest"))
        return f8, f16


class FFM(tnn.Module):
    def __init__(self):
        super().__init__()
        self.convblk = ConvBNReLU(256, 256, 1, 1, 0)
        self.conv1 = tnn.Conv2d(256, 64, 1)
        self.conv2 = tnn.Conv2d(64, 256, 1)

    def forward(self, sp, cp):
        feat = self.convblk(torch.cat([sp, cp], dim=1))
        atten = F.adaptive_avg_pool2d(feat, 1)
        atten = torch.sigmoid(self.conv2(F.relu(self.conv1(atten))))
        return feat * atten + feat


class Head(tnn.Module):
    def __init__(self, cin, mid, n):
        super().__init__()
        self.conv = ConvBNReLU(cin, mid, 3, 1, 1)
        self.conv_out = tnn.Conv2d(mid, n, 1)

    def forward(self, x):
        return self.conv_out(self.conv(x))


class BiSeNet(tnn.Module):
    def __init__(self, n_classes=19):
        super().__init__()
        self.cp = ContextPath()
        self.ffm = FFM()
        self.conv_out = Head(256, 256, n_classes)

    def forward(self, x):
        h, w = x.shape[2:]
        f8, cp8 = self.cp(x)
        feat = self.ffm(f8, cp8)
        out = self.conv_out(feat)
        return F.interpolate(out, (h, w), mode="bilinear", align_corners=True)


def test_bisenet_forward_parity():
    torch.manual_seed(0)
    net = BiSeNet().eval()
    # randomize BN running stats so parity is non-trivial
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.6, 1.4)
    params = jb.from_torch(net.state_dict())
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(jb.forward(params, jnp.asarray(x))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_parse_faces_shapes():
    import jax
    params = jb.init_params(jax.random.PRNGKey(0))
    imgs = [np.random.randint(0, 255, (512, 512, 3), np.uint8)
            for _ in range(2)]
    labels = jb.parse_faces(params, imgs)
    assert labels.shape == (2, 512, 512)
    assert labels.dtype in (np.int32, np.int64)
    assert labels.max() < 19
