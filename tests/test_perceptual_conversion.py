"""Golden numerical tests for the torch->flax perceptual-network converters
(convert_torch_vgg16 / convert_torch_state_dict / convert_torch_lpips).

torchvision is not installed here, so each test hand-builds a torch module
whose state-dict key layout matches the real source network (torchvision
vgg16.features / alexnet.features, pytorch-fid InceptionV3 — the layouts the
reference loads at /root/reference/models/losses/vgg16.py:15-22,
/root/reference/models/inception.py:13), randomly initializes it, runs the
torch forward, converts the state dict, and asserts the flax forward matches.
This proves converter correctness end-to-end; only the pretrained *values*
need the real downloads."""
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp


def _to_nhwc(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def _seed_bn(bn, gen):
    with torch.no_grad():
        bn.weight.normal_(0, 1.0, generator=gen)
        bn.bias.normal_(0, 0.5, generator=gen)
        bn.running_mean.normal_(0, 0.5, generator=gen)
        bn.running_var.uniform_(0.5, 1.5, generator=gen)


# ---------------------------------------------------------------- VGG16 ---
def _torch_vgg16_features():
    """torchvision vgg16.features layout (cfg D), keys '0.weight' etc."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers, in_c = [], 3
    for c in cfg:
        if c == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(in_c, c, 3, padding=1), tnn.ReLU()]
            in_c = c
    return tnn.Sequential(*layers)


def test_convert_torch_vgg16_golden():
    from stinet_tpu.models.vgg import VGG16Features, convert_torch_vgg16
    torch.manual_seed(0)
    net = _torch_vgg16_features().eval()
    x = torch.randn(2, 3, 64, 64)
    slices, out = [], x
    with torch.no_grad():
        for i, layer in enumerate(net):
            out = layer(out)
            if i in (3, 8, 15, 22):  # relu1_2/2_2/3_3/4_3
                slices.append(out.clone())
            if i == 22:
                break
    variables = convert_torch_vgg16(net.state_dict())
    feats = VGG16Features().apply(variables, _to_nhwc(x))
    assert len(feats) == 4
    for got, want in zip(feats, slices):
        np.testing.assert_allclose(
            np.asarray(got), want.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------- LPIPS ---
def _torch_alexnet_features():
    """torchvision alexnet.features layout: convs at indices 0,3,6,8,10."""
    return tnn.Sequential(
        tnn.Conv2d(3, 64, 11, stride=4, padding=2), tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(64, 192, 5, padding=2), tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(192, 384, 3, padding=1), tnn.ReLU(),
        tnn.Conv2d(384, 256, 3, padding=1), tnn.ReLU(),
        tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(),
    )


def _torch_lpips(net, lins, x, y):
    """Reference lpips(alex) forward (Zhang et al.): scaling layer, relu
    features at the 5 stages, unit-normalize channels, squared diff,
    1x1 linear heads, spatial average, sum."""
    shift = torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1)
    scale = torch.tensor([.458, .448, .450]).view(1, 3, 1, 1)
    xs, ys = (x - shift) / scale, (y - shift) / scale
    relu_idx = {1, 4, 7, 9, 11}
    total = 0.0
    fx, fy = xs, ys
    stage = 0
    for i, layer in enumerate(net):
        fx, fy = layer(fx), layer(fy)
        if i in relu_idx:
            nx = fx / torch.sqrt((fx ** 2).sum(1, keepdim=True) + 1e-10)
            ny = fy / torch.sqrt((fy ** 2).sum(1, keepdim=True) + 1e-10)
            d = (nx - ny) ** 2
            w = lins[stage].view(1, -1, 1, 1)
            total = total + (d * w).sum(1).mean(dim=(1, 2))
            stage += 1
    return total


def test_convert_torch_lpips_golden():
    from stinet_tpu.metrics.lpips import LPIPS, convert_torch_lpips
    torch.manual_seed(1)
    net = _torch_alexnet_features().eval()
    lins = [torch.rand(c) for c in (64, 192, 384, 256, 256)]
    lpips_sd = {f"lin{i}.model.1.weight": w.view(1, -1, 1, 1)
                for i, w in enumerate(lins)}
    alex_sd = {f"features.{k}": v for k, v in net.state_dict().items()}
    x = torch.rand(2, 3, 64, 64) * 2 - 1
    y = torch.rand(2, 3, 64, 64) * 2 - 1
    with torch.no_grad():
        want = _torch_lpips(net, lins, x, y).numpy()
    variables, lin_w = convert_torch_lpips(alex_sd, lpips_sd)
    got = np.asarray(LPIPS(variables, lin_w)(_to_nhwc(x), _to_nhwc(y)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------ Inception ---
class TBasicConv(tnn.Module):
    def __init__(self, i, o, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(i, o, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(o, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avg3(x):
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


class TFidA(tnn.Module):
    def __init__(self, i, pool):
        super().__init__()
        self.branch1x1 = TBasicConv(i, 64, kernel_size=1)
        self.branch5x5_1 = TBasicConv(i, 48, kernel_size=1)
        self.branch5x5_2 = TBasicConv(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TBasicConv(i, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TBasicConv(i, pool, kernel_size=1)

    def forward(self, x):
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([self.branch1x1(x), b5, bd,
                          self.branch_pool(_avg3(x))], 1)


class TFidB(tnn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch3x3 = TBasicConv(i, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = TBasicConv(i, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([self.branch3x3(x), bd,
                          F.max_pool2d(x, 3, stride=2)], 1)


class TFidC(tnn.Module):
    def __init__(self, i, c7):
        super().__init__()
        self.branch1x1 = TBasicConv(i, 192, kernel_size=1)
        self.branch7x7_1 = TBasicConv(i, c7, kernel_size=1)
        self.branch7x7_2 = TBasicConv(c7, c7, kernel_size=(1, 7),
                                      padding=(0, 3))
        self.branch7x7_3 = TBasicConv(c7, 192, kernel_size=(7, 1),
                                      padding=(3, 0))
        self.branch7x7dbl_1 = TBasicConv(i, c7, kernel_size=1)
        self.branch7x7dbl_2 = TBasicConv(c7, c7, kernel_size=(7, 1),
                                         padding=(3, 0))
        self.branch7x7dbl_3 = TBasicConv(c7, c7, kernel_size=(1, 7),
                                         padding=(0, 3))
        self.branch7x7dbl_4 = TBasicConv(c7, c7, kernel_size=(7, 1),
                                         padding=(3, 0))
        self.branch7x7dbl_5 = TBasicConv(c7, 192, kernel_size=(1, 7),
                                         padding=(0, 3))
        self.branch_pool = TBasicConv(i, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_1(x)
        bd = self.branch7x7dbl_3(self.branch7x7dbl_2(bd))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(bd))
        return torch.cat([self.branch1x1(x), b7, bd,
                          self.branch_pool(_avg3(x))], 1)


class TFidD(tnn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch3x3_1 = TBasicConv(i, 192, kernel_size=1)
        self.branch3x3_2 = TBasicConv(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = TBasicConv(i, 192, kernel_size=1)
        self.branch7x7x3_2 = TBasicConv(192, 192, kernel_size=(1, 7),
                                        padding=(0, 3))
        self.branch7x7x3_3 = TBasicConv(192, 192, kernel_size=(7, 1),
                                        padding=(3, 0))
        self.branch7x7x3_4 = TBasicConv(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(
            self.branch7x7x3_2(self.branch7x7x3_1(x))))
        return torch.cat([b3, b7, F.max_pool2d(x, 3, stride=2)], 1)


class TFidE(tnn.Module):
    def __init__(self, i, pool_type):
        super().__init__()
        self.pool_type = pool_type
        self.branch1x1 = TBasicConv(i, 320, kernel_size=1)
        self.branch3x3_1 = TBasicConv(i, 384, kernel_size=1)
        self.branch3x3_2a = TBasicConv(384, 384, kernel_size=(1, 3),
                                       padding=(0, 1))
        self.branch3x3_2b = TBasicConv(384, 384, kernel_size=(3, 1),
                                       padding=(1, 0))
        self.branch3x3dbl_1 = TBasicConv(i, 448, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = TBasicConv(384, 384, kernel_size=(1, 3),
                                          padding=(0, 1))
        self.branch3x3dbl_3b = TBasicConv(384, 384, kernel_size=(3, 1),
                                          padding=(1, 0))
        self.branch_pool = TBasicConv(i, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        if self.pool_type == "avg":
            bp = _avg3(x)
        else:
            bp = F.max_pool2d(x, 3, stride=1, padding=1)
        return torch.cat([self.branch1x1(x), b3, bd,
                          self.branch_pool(bp)], 1)


class TFidInception(tnn.Module):
    """pytorch-fid InceptionV3 trunk with its state-dict key layout
    (reference /root/reference/models/inception.py:184-328)."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = TBasicConv(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = TBasicConv(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = TBasicConv(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = TBasicConv(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = TBasicConv(80, 192, kernel_size=3)
        self.Mixed_5b = TFidA(192, 32)
        self.Mixed_5c = TFidA(256, 64)
        self.Mixed_5d = TFidA(288, 64)
        self.Mixed_6a = TFidB(288)
        self.Mixed_6b = TFidC(768, 128)
        self.Mixed_6c = TFidC(768, 160)
        self.Mixed_6d = TFidC(768, 160)
        self.Mixed_6e = TFidC(768, 192)
        self.Mixed_7a = TFidD(768)
        self.Mixed_7b = TFidE(1280, "avg")
        self.Mixed_7c = TFidE(2048, "max")

    def forward(self, x):
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        for blk in (self.Mixed_5b, self.Mixed_5c, self.Mixed_5d,
                    self.Mixed_6a, self.Mixed_6b, self.Mixed_6c,
                    self.Mixed_6d, self.Mixed_6e, self.Mixed_7a,
                    self.Mixed_7b, self.Mixed_7c):
            x = blk(x)
        return F.adaptive_avg_pool2d(x, 1).flatten(1)


@pytest.mark.slow
def test_convert_torch_inception_golden():
    from stinet_tpu.models.inception import (
        InceptionV3, convert_torch_state_dict)
    torch.manual_seed(2)
    gen = torch.Generator().manual_seed(3)
    net = TFidInception().eval()
    for m in net.modules():
        if isinstance(m, tnn.BatchNorm2d):
            _seed_bn(m, gen)
    x = torch.rand(1, 3, 96, 96)
    with torch.no_grad():
        want = net(x).numpy()
    variables = convert_torch_state_dict(net.state_dict())
    model = InceptionV3(resize_input=False, normalize_input=False)
    got = np.asarray(model.apply(variables, _to_nhwc(x)))
    assert got.shape == want.shape == (1, 2048)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_convert_cli_msgpack_roundtrip(tmp_path, monkeypatch):
    """The offline conversion CLI writes msgpack weight files that load back
    identical to direct conversion (the trainers accept either form)."""
    import sys
    from stinet_tpu.utils import convert_perceptual_weights as cpw
    from stinet_tpu.models.vgg import convert_torch_vgg16

    torch.manual_seed(4)
    net = _torch_vgg16_features()
    torch_path = str(tmp_path / "vgg16.pth")
    out_path = str(tmp_path / "vgg16.msgpack")
    torch.save(net.state_dict(), torch_path)

    monkeypatch.setattr(sys, "argv", ["cpw", "vgg", "--torch", torch_path,
                                      "--out", out_path])
    cpw.main()
    loaded = cpw.load_msgpack(out_path)
    want = convert_torch_vgg16(net.state_dict())
    flat_w = jax.tree_util.tree_leaves_with_path(want)
    flat_l = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_leaves_with_path(loaded)}
    assert len(flat_w) == len(flat_l)
    for k, v in flat_w:
        np.testing.assert_array_equal(flat_l[jax.tree_util.keystr(k)], v)

    # lpips variant incl. linear heads
    alex = _torch_alexnet_features()
    lins = {f"lin{i}.model.1.weight": torch.rand(1, c, 1, 1)
            for i, c in enumerate((64, 192, 384, 256, 256))}
    alex_path = str(tmp_path / "alex.pth")
    lpips_path = str(tmp_path / "lpips.pth")
    lp_out = str(tmp_path / "lpips.msgpack")
    torch.save({f"features.{k}": v for k, v in alex.state_dict().items()},
               alex_path)
    torch.save(lins, lpips_path)
    monkeypatch.setattr(sys, "argv", ["cpw", "lpips", "--torch", alex_path,
                                      "--lpips-torch", lpips_path,
                                      "--out", lp_out])
    cpw.main()
    tree = cpw.load_msgpack(lp_out)
    assert len(tree["lins"]) == 5
    assert "conv_0" in tree["variables"]["params"]
