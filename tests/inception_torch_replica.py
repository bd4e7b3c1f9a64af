"""Torch InceptionV3 backbone replica (torchvision module layout) for
numerics cross-checks — torchvision itself is not installed in this
environment, but its InceptionV3 architecture is standard (and is the
layout of the NVlabs FID torchscript export the reference loads,
reference feat_mba.py:29-92).  Lazy conv/BN modules keep this compact;
parameter names match ``Mixed_5b.branch1x1.conv.weight`` etc. so
``convert_torch_inception`` consumes ``named_parameters()`` directly.
"""

import torch
import torch.nn.functional as F
from torch import nn


class BasicConv2d(nn.Module):
    def __init__(self, out, **kw):
        super().__init__()
        self.conv = nn.LazyConv2d(out, bias=False, **kw)
        self.bn = nn.LazyBatchNorm2d(eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avg(x):
    return F.avg_pool2d(x, kernel_size=3, stride=1, padding=1)


class InceptionA(nn.Module):
    def __init__(self, pool_features):
        super().__init__()
        self.branch1x1 = BasicConv2d(64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2d(pool_features, kernel_size=1)

    def forward(self, x):
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(_avg(x))], 1)


class InceptionB(nn.Module):
    def __init__(self):
        super().__init__()
        self.branch3x3 = BasicConv2d(384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BasicConv2d(64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, kernel_size=3, stride=2)], 1)


class InceptionC(nn.Module):
    def __init__(self, c7):
        super().__init__()
        self.branch1x1 = BasicConv2d(192, kernel_size=1)
        self.branch7x7_1 = BasicConv2d(c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2d(c7, kernel_size=(1, 7),
                                       padding=(0, 3))
        self.branch7x7_3 = BasicConv2d(192, kernel_size=(7, 1),
                                       padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2d(c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2d(c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2d(c7, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2d(c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2d(192, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch_pool = BasicConv2d(192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_1(x)
        for m in (self.branch7x7dbl_2, self.branch7x7dbl_3,
                  self.branch7x7dbl_4, self.branch7x7dbl_5):
            bd = m(bd)
        return torch.cat([self.branch1x1(x), b7, bd,
                          self.branch_pool(_avg(x))], 1)


class InceptionD(nn.Module):
    def __init__(self):
        super().__init__()
        self.branch3x3_1 = BasicConv2d(192, kernel_size=1)
        self.branch3x3_2 = BasicConv2d(320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BasicConv2d(192, kernel_size=1)
        self.branch7x7x3_2 = BasicConv2d(192, kernel_size=(1, 7),
                                         padding=(0, 3))
        self.branch7x7x3_3 = BasicConv2d(192, kernel_size=(7, 1),
                                         padding=(3, 0))
        self.branch7x7x3_4 = BasicConv2d(192, kernel_size=3, stride=2)

    def forward(self, x):
        b7 = self.branch7x7x3_1(x)
        for m in (self.branch7x7x3_2, self.branch7x7x3_3,
                  self.branch7x7x3_4):
            b7 = m(b7)
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)), b7,
            F.max_pool2d(x, kernel_size=3, stride=2)], 1)


class InceptionE(nn.Module):
    def __init__(self):
        super().__init__()
        self.branch1x1 = BasicConv2d(320, kernel_size=1)
        self.branch3x3_1 = BasicConv2d(384, kernel_size=1)
        self.branch3x3_2a = BasicConv2d(384, kernel_size=(1, 3),
                                        padding=(0, 1))
        self.branch3x3_2b = BasicConv2d(384, kernel_size=(3, 1),
                                        padding=(1, 0))
        self.branch3x3dbl_1 = BasicConv2d(448, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = BasicConv2d(384, kernel_size=(1, 3),
                                           padding=(0, 1))
        self.branch3x3dbl_3b = BasicConv2d(384, kernel_size=(3, 1),
                                           padding=(1, 0))
        self.branch_pool = BasicConv2d(192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd),
                        self.branch3x3dbl_3b(bd)], 1)
        return torch.cat([self.branch1x1(x), b3, bd,
                          self.branch_pool(_avg(x))], 1)


class InceptionV3Backbone(nn.Module):
    """Stem + Mixed_5b..7c + global average pool (2048-d features)."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = BasicConv2d(32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2d(80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(192, kernel_size=3)
        self.Mixed_5b = InceptionA(32)
        self.Mixed_5c = InceptionA(64)
        self.Mixed_5d = InceptionA(64)
        self.Mixed_6a = InceptionB()
        self.Mixed_6b = InceptionC(128)
        self.Mixed_6c = InceptionC(160)
        self.Mixed_6d = InceptionC(160)
        self.Mixed_6e = InceptionC(192)
        self.Mixed_7a = InceptionD()
        self.Mixed_7b = InceptionE()
        self.Mixed_7c = InceptionE()

    def forward(self, x):
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = F.max_pool2d(x, kernel_size=3, stride=2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = F.max_pool2d(x, kernel_size=3, stride=2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, name)(x)
        return x.mean(dim=(2, 3))


def build_torch_inception(seed: int = 0) -> InceptionV3Backbone:
    """Materialized, randomly-initialized backbone in eval mode with
    non-trivial BN running stats."""
    torch.manual_seed(seed)
    m = InceptionV3Backbone()
    with torch.no_grad():
        m(torch.zeros(1, 3, 299, 299))  # materialize lazy modules
        for mod in m.modules():
            if isinstance(mod, nn.BatchNorm2d):
                nn.init.normal_(mod.weight, 1.0, 0.1)
                nn.init.normal_(mod.bias, 0.0, 0.05)
                mod.running_mean.normal_(0.0, 0.05)
                mod.running_var.uniform_(0.6, 1.4)
    return m.eval()
