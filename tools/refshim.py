"""Shim to import the read-only reference (torch) model definitions for
golden-output generation ONLY.  The runtime framework never imports this.

The reference environment assumes gevent and torchvision, neither of
which exists in this image; both are stubbed with the minimal surface
the model-definition modules touch.
"""

import sys
import types


def installStubs():
    if "gevent" not in sys.modules:
        g = types.ModuleType("gevent")
        g.spawn = lambda *a, **k: types.SimpleNamespace(
            start=lambda: None, get=lambda: None
        )
        g.spawn_later = g.spawn
        g.sleep = lambda *a: None
        g.idle = lambda *a: None
        ge = types.ModuleType("gevent.event")

        class _Event:
            def __init__(self):
                self._f = False

            def is_set(self):
                return self._f

            def set(self):
                self._f = True

            def clear(self):
                self._f = False

            def wait(self, *a):
                pass

        ge.Event = _Event
        g.event = ge
        sys.modules["gevent"] = g
        sys.modules["gevent.event"] = ge

    if "torchvision" not in sys.modules:
        import torch
        import torch.nn.functional as F

        tv = types.ModuleType("torchvision")
        tf = types.ModuleType("torchvision.transforms")
        tff = types.ModuleType("torchvision.transforms.functional")
        tops = types.ModuleType("torchvision.ops")
        tmodels = types.ModuleType("torchvision.models")
        tresnet = types.ModuleType("torchvision.models.resnet")

        def to_tensor(pic):
            import numpy as np

            arr = np.array(pic)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            t = torch.from_numpy(arr.transpose(2, 0, 1)).contiguous()
            if t.dtype == torch.uint8:
                t = t.float() / 255.0
            return t

        tff.to_tensor = to_tensor

        class Normalize:
            def __init__(self, mean, std):
                self.mean = torch.tensor(mean).view(-1, 1, 1)
                self.std = torch.tensor(std).view(-1, 1, 1)

            def __call__(self, x):
                return (x - self.mean.to(x)) / self.std.to(x)

        tf.Normalize = Normalize
        tf.functional = tff

        def deform_conv2d(input, offset, weight, bias=None, stride=(1, 1),
                          padding=(0, 0), dilation=(1, 1), mask=None):
            """Pure-torch modulated deformable conv (reference golden only)."""
            if isinstance(stride, int):
                stride = (stride, stride)
            if isinstance(padding, int):
                padding = (padding, padding)
            if isinstance(dilation, int):
                dilation = (dilation, dilation)
            b, cin, h, w = input.shape
            cout, cing, kh, kw = weight.shape
            groups = cin // cing
            oh = (h + 2 * padding[0] - dilation[0] * (kh - 1) - 1) // stride[0] + 1
            ow = (w + 2 * padding[1] - dilation[1] * (kw - 1) - 1) // stride[1] + 1
            dg = offset.shape[1] // (2 * kh * kw)
            offset = offset.view(b, dg, kh * kw, 2, oh, ow)
            if mask is None:
                mask = torch.ones(b, dg, kh * kw, oh, ow, dtype=input.dtype)
            else:
                mask = mask.view(b, dg, kh * kw, oh, ow)
            ys = torch.arange(oh, dtype=input.dtype) * stride[0] - padding[0]
            xs = torch.arange(ow, dtype=input.dtype) * stride[1] - padding[1]
            cols = []
            for ky in range(kh):
                for kx in range(kw):
                    kidx = ky * kw + kx
                    py = ys.view(1, 1, oh, 1) + ky * dilation[0] + offset[:, :, kidx, 0]
                    px = xs.view(1, 1, 1, ow) + kx * dilation[1] + offset[:, :, kidx, 1]
                    gy = 2 * py / max(h - 1, 1) - 1
                    gx = 2 * px / max(w - 1, 1) - 1
                    grid = torch.stack([gx, gy], dim=-1).view(b * dg, oh, ow, 2)
                    inp = input.view(b * dg, cin // dg, h, w)
                    samp = F.grid_sample(inp, grid, mode="bilinear",
                                         padding_mode="zeros", align_corners=True)
                    samp = samp.view(b, cin, oh, ow) * mask[:, :, kidx].repeat_interleave(cin // dg, dim=1)
                    cols.append(samp)
            col = torch.stack(cols, dim=2)  # b, cin, k*k, oh, ow
            col = col.view(b, groups, cing, kh * kw, oh * ow)
            wmat = weight.view(groups, cout // groups, cing * kh * kw)
            col = col.permute(0, 1, 2, 3, 4).reshape(b, groups, cing * kh * kw, oh * ow)
            out = torch.einsum("gok,bgkn->bgon", wmat, col).reshape(b, cout, oh, ow)
            if bias is not None:
                out = out + bias.view(1, -1, 1, 1)
            return out

        tops.deform_conv2d = deform_conv2d

        try:
            from torch.hub import load_state_dict_from_url  # noqa: F401
        except Exception:
            pass

        import torch.nn as nn

        class BasicBlock(nn.Module):
            expansion = 1

            def __init__(self, inplanes, planes, stride=1, downsample=None,
                         groups=1, base_width=64, dilation=1, norm_layer=None):
                super().__init__()
                norm_layer = norm_layer or nn.BatchNorm2d
                self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
                self.bn1 = norm_layer(planes)
                self.relu = nn.ReLU(inplace=True)
                self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
                self.bn2 = norm_layer(planes)
                self.downsample = downsample
                self.stride = stride

            def forward(self, x):
                identity = x
                out = self.relu(self.bn1(self.conv1(x)))
                out = self.bn2(self.conv2(out))
                if self.downsample is not None:
                    identity = self.downsample(x)
                return self.relu(out + identity)

        class ResNet(nn.Module):
            def __init__(self, block, layers, num_classes=1000, **_):
                super().__init__()
                self.inplanes = 64
                self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
                self.bn1 = nn.BatchNorm2d(64)
                self.relu = nn.ReLU(inplace=True)
                self.maxpool = nn.MaxPool2d(3, 2, 1)
                self.layer1 = self._make_layer(block, 64, layers[0])
                self.layer2 = self._make_layer(block, 128, layers[1], 2)
                self.layer3 = self._make_layer(block, 256, layers[2], 2)
                self.layer4 = self._make_layer(block, 512, layers[3], 2)
                self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
                self.fc = nn.Linear(512 * block.expansion, num_classes)

            def _make_layer(self, block, planes, blocks, stride=1):
                downsample = None
                if stride != 1 or self.inplanes != planes * block.expansion:
                    downsample = nn.Sequential(
                        nn.Conv2d(self.inplanes, planes * block.expansion, 1,
                                  stride, bias=False),
                        nn.BatchNorm2d(planes * block.expansion),
                    )
                layers = [block(self.inplanes, planes, stride, downsample)]
                self.inplanes = planes * block.expansion
                layers += [block(self.inplanes, planes) for _ in range(1, blocks)]
                return nn.Sequential(*layers)

            def forward(self, x):
                x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
                x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
                x = self.avgpool(x)
                x = torch.flatten(x, 1)
                return self.fc(x)

        tresnet.ResNet = ResNet
        tresnet.BasicBlock = BasicBlock
        tmodels.resnet = tresnet
        tv.transforms = tf
        tv.ops = tops
        tv.models = tmodels
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tf
        sys.modules["torchvision.transforms.functional"] = tff
        sys.modules["torchvision.ops"] = tops
        sys.modules["torchvision.models"] = tmodels
        sys.modules["torchvision.models.resnet"] = tresnet

    if "ailut" not in sys.modules:
        # the reference's AiLUT.py imports the compiled ailut extension,
        # which is not built in this image; golden generation bypasses
        # the transform (bench.py applies the repo's own XLA transform,
        # bit-matched to the CUDA algorithm, to the torch-made
        # luts/vertices), so the symbol only needs to exist
        al = types.ModuleType("ailut")

        def _missing(*a, **k):
            raise RuntimeError("ailut extension not built on this host")

        al.ailut_transform = _missing
        sys.modules["ailut"] = al


def importReference():
    installStubs()
    if "/root/reference/python" not in sys.path:
        sys.path.insert(0, "/root/reference/python")
