"""Torch twin of the UltraFace network — the CPU numerical oracle.

The real ONNX weights are unreachable in this environment (no network
egress), so tests validate the JAX implementation against an independent
torch implementation of the same published architecture
(Ultra-Light-Fast-Generic-Face-Detector-1MB Mb_Tiny_RFB + SSD). Torch's
conv/BN are a trusted stand-in for ONNX runtime semantics: if the JAX model
matches the twin on random weights, it computes the same function the real
exported graph computes, so loading real weights through
models/convert.py preserves reference parity (reference
infer_server/src/nn.rs:164-186).

The twin also exports a state_dict with upstream parameter names, which
exercises the same name mapping that the ONNX converter uses.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

BASE = 16
NUM_CLASSES = 2


def conv_bn(inp, oup, stride):
    return nn.Sequential(
        nn.Conv2d(inp, oup, 3, stride, 1, bias=False),
        nn.BatchNorm2d(oup),
        nn.ReLU(inplace=True),
    )


def conv_dw(inp, oup, stride):
    return nn.Sequential(
        nn.Conv2d(inp, inp, 3, stride, 1, groups=inp, bias=False),
        nn.BatchNorm2d(inp),
        nn.ReLU(inplace=True),
        nn.Conv2d(inp, oup, 1, 1, 0, bias=False),
        nn.BatchNorm2d(oup),
        nn.ReLU(inplace=True),
    )


class BasicConv(nn.Module):
    def __init__(self, in_planes, out_planes, kernel_size, stride=1,
                 padding=0, dilation=1, relu=True):
        super().__init__()
        self.conv = nn.Conv2d(in_planes, out_planes, kernel_size, stride,
                              padding, dilation, bias=False)
        self.bn = nn.BatchNorm2d(out_planes, eps=1e-5, momentum=0.01,
                                 affine=True)
        self.relu = nn.ReLU(inplace=True) if relu else None

    def forward(self, x):
        x = self.bn(self.conv(x))
        return self.relu(x) if self.relu is not None else x


class BasicRFB(nn.Module):
    def __init__(self, in_planes, out_planes, stride=1, scale=1.0,
                 map_reduce=8, vision=1):
        super().__init__()
        self.scale = scale
        inter = in_planes // map_reduce
        self.branch0 = nn.Sequential(
            BasicConv(in_planes, inter, 1, relu=False),
            BasicConv(inter, 2 * inter, 3, stride, padding=1),
            BasicConv(2 * inter, 2 * inter, 3, 1, padding=vision + 1,
                      dilation=vision + 1, relu=False),
        )
        self.branch1 = nn.Sequential(
            BasicConv(in_planes, inter, 1, relu=False),
            BasicConv(inter, 2 * inter, 3, stride, padding=1),
            BasicConv(2 * inter, 2 * inter, 3, 1, padding=vision + 2,
                      dilation=vision + 2, relu=False),
        )
        self.branch2 = nn.Sequential(
            BasicConv(in_planes, inter, 1, relu=False),
            BasicConv(inter, (inter // 2) * 3, 3, 1, padding=1),
            BasicConv((inter // 2) * 3, 2 * inter, 3, stride, padding=1),
            BasicConv(2 * inter, 2 * inter, 3, 1, padding=vision + 4,
                      dilation=vision + 4, relu=False),
        )
        self.ConvLinear = BasicConv(6 * inter, out_planes, 1, relu=False)
        self.shortcut = BasicConv(in_planes, out_planes, 1, stride,
                                  relu=False)
        self.relu = nn.ReLU(inplace=False)

    def forward(self, x):
        out = torch.cat(
            (self.branch0(x), self.branch1(x), self.branch2(x)), 1)
        out = self.ConvLinear(out)
        return self.relu(out * self.scale + self.shortcut(x))


def separable(in_ch, out_ch, kernel_size=3, stride=1, padding=1):
    return nn.Sequential(
        nn.Conv2d(in_ch, in_ch, kernel_size, stride, padding,
                  groups=in_ch),
        nn.ReLU(inplace=True),
        nn.Conv2d(in_ch, out_ch, 1),
    )


class UltraFaceTwin(nn.Module):
    """Test-mode UltraFace: outputs (softmax scores, decoded corner boxes).

    ``arch="RFB"`` puts the BasicRFB at block 7 (upstream Mb_Tiny_RFB);
    ``arch="slim"`` uses a plain conv_dw there (upstream Mb_Tiny).
    """

    def __init__(self, priors: torch.Tensor, arch: str = "RFB",
                 interleaved: bool = False):
        super().__init__()
        # interleaved=True traces each level's heads AT its source
        # layer like the genuine upstream SSD.forward
        # (source_layer_indexes=[8, 11, 13]) — the conv ORDER the real
        # version-RFB ONNX artifacts contain; False groups all heads
        # after the backbone (the common re-implementation order)
        self.interleaved = interleaved
        c = BASE
        block7 = (conv_dw(4 * c, 4 * c, 1) if arch == "slim"
                  else BasicRFB(4 * c, 4 * c, stride=1, scale=1.0))
        self.base_net = nn.Sequential(
            conv_bn(3, c, 2),
            conv_dw(c, 2 * c, 1),
            conv_dw(2 * c, 2 * c, 2),
            conv_dw(2 * c, 2 * c, 1),
            conv_dw(2 * c, 4 * c, 2),
            conv_dw(4 * c, 4 * c, 1),
            conv_dw(4 * c, 4 * c, 1),
            block7,
            conv_dw(4 * c, 8 * c, 2),
            conv_dw(8 * c, 8 * c, 1),
            conv_dw(8 * c, 8 * c, 1),
            conv_dw(8 * c, 16 * c, 2),
            conv_dw(16 * c, 16 * c, 1),
        )
        # ModuleList-wrapped to reproduce upstream state_dict names
        # (extras.0.0.*, extras.0.2.*).
        self.extras = nn.ModuleList([nn.Sequential(
            nn.Conv2d(16 * c, 4 * c, 1),
            nn.ReLU(inplace=True),
            separable(4 * c, 16 * c, 3, stride=2, padding=1),
            nn.ReLU(inplace=True),
        )])
        self.classification_headers = nn.ModuleList([
            separable(4 * c, 3 * NUM_CLASSES),
            separable(8 * c, 2 * NUM_CLASSES),
            separable(16 * c, 2 * NUM_CLASSES),
            nn.Conv2d(16 * c, 3 * NUM_CLASSES, 3, padding=1),
        ])
        self.regression_headers = nn.ModuleList([
            separable(4 * c, 3 * 4),
            separable(8 * c, 2 * 4),
            separable(16 * c, 2 * 4),
            nn.Conv2d(16 * c, 3 * 4, 3, padding=1),
        ])
        self.register_buffer("priors", priors)

    def forward(self, x):
        def head(level, feat, confs, locs):
            c = self.classification_headers[level](feat)
            l = self.regression_headers[level](feat)
            b = c.shape[0]
            confs.append(
                c.permute(0, 2, 3, 1).reshape(b, -1, NUM_CLASSES))
            locs.append(l.permute(0, 2, 3, 1).reshape(b, -1, 4))

        confs, locs = [], []
        if self.interleaved:
            attach = {7: 0, 10: 1, 12: 2}
            for i, layer in enumerate(self.base_net):
                x = layer(x)
                if i in attach:
                    head(attach[i], x, confs, locs)
            head(3, self.extras[0](x), confs, locs)
        else:
            feats = []
            for i, layer in enumerate(self.base_net):
                x = layer(x)
                if i in (7, 10, 12):
                    feats.append(x)
            feats.append(self.extras[0](x))
            for level, feat in enumerate(feats):
                head(level, feat, confs, locs)
        conf = torch.cat(confs, dim=1)
        loc = torch.cat(locs, dim=1)

        scores = F.softmax(conf, dim=2)
        centers = loc[..., :2] * 0.1 * self.priors[..., 2:] \
            + self.priors[..., :2]
        wh = torch.exp(loc[..., 2:] * 0.2) * self.priors[..., 2:]
        boxes = torch.cat([centers - wh / 2, centers + wh / 2], dim=2)
        return scores, boxes
