"""Golden tests for the FID InceptionV3 feature extractor
(refid_tpu/eval/inception.py) — the component the reference ships broken
(basicsr/metrics/fid.py:7 imports a nonexistent module).

The oracle is an INDEPENDENT hand-written torch implementation of
pytorch-fid's patched Inception3 (same module names as the real
pt_inception-2015-12-05 checkpoint, so ``convert_torch_state_dict`` is
exercised against the exact state_dict key layout), randomly initialized
and run in eval mode.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from refid_tpu.eval.inception import (convert_torch_state_dict,
                                      inception_v3_features,
                                      extract_inception_features)
from refid_tpu.eval.fid import calculate_fid, extract_statistics


class Basic(nn.Module):
    """BasicConv2d: conv(bias=False) + BN(eps=1e-3) + relu."""

    def __init__(self, ci, co, k, stride=1, padding=0):
        super().__init__()
        self.conv = nn.Conv2d(ci, co, k, stride=stride, padding=padding,
                              bias=False)
        self.bn = nn.BatchNorm2d(co, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class IncA(nn.Module):
    def __init__(self, ci, pool):
        super().__init__()
        self.branch1x1 = Basic(ci, 64, 1)
        self.branch5x5_1 = Basic(ci, 48, 1)
        self.branch5x5_2 = Basic(48, 64, 5, padding=2)
        self.branch3x3dbl_1 = Basic(ci, 64, 1)
        self.branch3x3dbl_2 = Basic(64, 96, 3, padding=1)
        self.branch3x3dbl_3 = Basic(96, 96, 3, padding=1)
        self.branch_pool = Basic(ci, pool, 1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        # pytorch-fid patch: count_include_pad=False
        bp = self.branch_pool(F.avg_pool2d(x, 3, 1, 1,
                                           count_include_pad=False))
        return torch.cat([b1, b5, bd, bp], 1)


class IncB(nn.Module):
    def __init__(self, ci):
        super().__init__()
        self.branch3x3 = Basic(ci, 384, 3, stride=2)
        self.branch3x3dbl_1 = Basic(ci, 64, 1)
        self.branch3x3dbl_2 = Basic(64, 96, 3, padding=1)
        self.branch3x3dbl_3 = Basic(96, 96, 3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([b3, bd, F.max_pool2d(x, 3, 2)], 1)


class IncC(nn.Module):
    def __init__(self, ci, c7):
        super().__init__()
        self.branch1x1 = Basic(ci, 192, 1)
        self.branch7x7_1 = Basic(ci, c7, 1)
        self.branch7x7_2 = Basic(c7, c7, (1, 7), padding=(0, 3))
        self.branch7x7_3 = Basic(c7, 192, (7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = Basic(ci, c7, 1)
        self.branch7x7dbl_2 = Basic(c7, c7, (7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = Basic(c7, c7, (1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = Basic(c7, c7, (7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = Basic(c7, 192, (1, 7), padding=(0, 3))
        self.branch_pool = Basic(ci, 192, 1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_1(x)
        bd = self.branch7x7dbl_3(self.branch7x7dbl_2(bd))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(bd))
        bp = self.branch_pool(F.avg_pool2d(x, 3, 1, 1,
                                           count_include_pad=False))
        return torch.cat([b1, b7, bd, bp], 1)


class IncD(nn.Module):
    def __init__(self, ci):
        super().__init__()
        self.branch3x3_1 = Basic(ci, 192, 1)
        self.branch3x3_2 = Basic(192, 320, 3, stride=2)
        self.branch7x7x3_1 = Basic(ci, 192, 1)
        self.branch7x7x3_2 = Basic(192, 192, (1, 7), padding=(0, 3))
        self.branch7x7x3_3 = Basic(192, 192, (7, 1), padding=(3, 0))
        self.branch7x7x3_4 = Basic(192, 192, 3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(
            self.branch7x7x3_2(self.branch7x7x3_1(x))))
        return torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)


class IncE(nn.Module):
    def __init__(self, ci, pool):
        super().__init__()
        self.pool = pool
        self.branch1x1 = Basic(ci, 320, 1)
        self.branch3x3_1 = Basic(ci, 384, 1)
        self.branch3x3_2a = Basic(384, 384, (1, 3), padding=(0, 1))
        self.branch3x3_2b = Basic(384, 384, (3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = Basic(ci, 448, 1)
        self.branch3x3dbl_2 = Basic(448, 384, 3, padding=1)
        self.branch3x3dbl_3a = Basic(384, 384, (1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = Basic(384, 384, (3, 1), padding=(1, 0))
        self.branch_pool = Basic(ci, 192, 1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd),
                        self.branch3x3dbl_3b(bd)], 1)
        if self.pool == "max":  # pytorch-fid patch on Mixed_7c
            pooled = F.max_pool2d(x, 3, 1, 1)
        else:
            pooled = F.avg_pool2d(x, 3, 1, 1, count_include_pad=False)
        return torch.cat([b1, b3, bd, self.branch_pool(pooled)], 1)


class PatchedInception3(nn.Module):
    """pytorch-fid's patched Inception3, pool3 (2048-d) features only.
    Module names == the pt_inception checkpoint's state_dict keys."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = Basic(3, 32, 3, stride=2)
        self.Conv2d_2a_3x3 = Basic(32, 32, 3)
        self.Conv2d_2b_3x3 = Basic(32, 64, 3, padding=1)
        self.Conv2d_3b_1x1 = Basic(64, 80, 1)
        self.Conv2d_4a_3x3 = Basic(80, 192, 3)
        self.Mixed_5b = IncA(192, 32)
        self.Mixed_5c = IncA(256, 64)
        self.Mixed_5d = IncA(288, 64)
        self.Mixed_6a = IncB(288)
        self.Mixed_6b = IncC(768, 128)
        self.Mixed_6c = IncC(768, 160)
        self.Mixed_6d = IncC(768, 160)
        self.Mixed_6e = IncC(768, 192)
        self.Mixed_7a = IncD(768)
        self.Mixed_7b = IncE(1280, pool="avg")
        self.Mixed_7c = IncE(2048, pool="max")
        self.fc = nn.Linear(2048, 1008)  # present in the ckpt, unused

    def forward(self, x):
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, 2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, 2)
        for m in [self.Mixed_5b, self.Mixed_5c, self.Mixed_5d,
                  self.Mixed_6a, self.Mixed_6b, self.Mixed_6c,
                  self.Mixed_6d, self.Mixed_6e, self.Mixed_7a,
                  self.Mixed_7b, self.Mixed_7c]:
            x = m(x)
        return x.mean(dim=(2, 3))  # adaptive avg pool -> (b, 2048)


def _random_oracle(seed=0):
    torch.manual_seed(seed)
    model = PatchedInception3().eval()
    with torch.no_grad():
        for mod in model.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.normal_(0.0, 0.2)
                mod.running_var.uniform_(0.5, 2.0)
                mod.weight.normal_(1.0, 0.2)
                mod.bias.normal_(0.0, 0.2)
            elif isinstance(mod, nn.Conv2d):
                mod.weight.normal_(0.0, 0.1)
    return model


def test_features_match_torch_oracle():
    """Architecture + state_dict conversion golden: jax features ==
    torch patched-Inception3 features on the same random weights."""
    model = _random_oracle(seed=3)
    params = convert_torch_state_dict(model.state_dict())

    rng = np.random.RandomState(0)
    x = rng.rand(2, 96, 96, 3).astype(np.float32)
    with torch.no_grad():
        # normalize_input: [0,1] -> [-1,1]
        ref = model(torch.from_numpy(
            (2.0 * x - 1.0).transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(inception_v3_features(
        params, jnp.asarray(x), resize_input=False, normalize_input=True))
    assert got.shape == (2, 2048)
    scale = max(np.abs(ref).max(), 1e-6)
    np.testing.assert_allclose(got / scale, ref / scale, atol=3e-4)


def test_resize_matches_torch_interpolate():
    """resize_input uses jax.image.resize 'bilinear' == torch
    F.interpolate(bilinear, align_corners=False) (half-pixel centers)."""
    import jax
    rng = np.random.RandomState(1)
    x = rng.rand(1, 17, 23, 3).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                        size=(299, 299), mode="bilinear",
                        align_corners=False).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(jax.image.resize(jnp.asarray(x), (1, 299, 299, 3),
                                      method="bilinear"))
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_fid_end_to_end():
    """The full pipeline the reference intended: batched feature
    extraction -> statistics -> Fréchet distance.  FID(x, x) == 0;
    FID(x, shifted-y) > 0."""
    import jax

    model = _random_oracle(seed=4)
    params = convert_torch_state_dict(model.state_dict())
    apply_fn = jax.jit(lambda p, x: inception_v3_features(
        p, x, resize_input=False, normalize_input=True))

    rng = np.random.RandomState(2)
    xs = rng.rand(8, 96, 96, 3).astype(np.float32)
    ys = np.clip(xs + 0.25 * rng.rand(8, 96, 96, 3).astype(np.float32),
                 0, 1)

    def gen(data, bs=4):
        for i in range(0, len(data), bs):
            yield data[i:i + bs]

    fx = extract_inception_features(gen(xs), params, apply_fn)
    fy = extract_inception_features(gen(ys), params, apply_fn)
    assert fx.shape == (8, 2048)

    # stats on a low-dim slice: with N=8 samples a 2048-d covariance is
    # rank-deficient and sqrtm is ill-posed (real FID runs N >> D)
    mu_x, sig_x = extract_statistics(fx[:, :5])
    mu_y, sig_y = extract_statistics(fy[:, :5])
    fid_same = calculate_fid(mu_x, sig_x, mu_x, sig_x)
    fid_diff = calculate_fid(mu_x, sig_x, mu_y, sig_y)
    # zero up to sqrtm roundoff, relative to the feature scale tr(sigma)
    assert abs(fid_same) < 1e-4 * np.trace(sig_x)
    assert fid_diff > 100 * max(abs(fid_same), 1e-12)
