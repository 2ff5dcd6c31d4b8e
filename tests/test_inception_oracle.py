"""Golden cross-check of the JAX InceptionV3 port against a torch oracle.

pytorch-fid / torchvision are not installed here, so the oracle is a
hand-built torch implementation of the SAME network pytorch-fid evaluates
(torchvision inception_v3 with the FID patches: BN eps 1e-3, avg pools with
count_include_pad=False, Mixed_7c branch_pool via max pool, 1008 logits) —
mirroring how `/root/reference/evaluations/c2i/evaluator.py` pins the 2015
weights. Weights are random; parity here validates converter + architecture
+ preprocessing (resize path) numerically, which bounds the FID delta of
the port for any fixed weights.
"""

import numpy as np
import pytest

import conftest  # noqa: F401

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional


class ConvBN(nn.Module):
    def __init__(self, cin, cout, k, stride=1, padding=0):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, stride=stride, padding=padding,
                              bias=False)
        self.bn = nn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avg(x):
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


class InceptionA(nn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = ConvBN(cin, 64, 1)
        self.branch5x5_1 = ConvBN(cin, 48, 1)
        self.branch5x5_2 = ConvBN(48, 64, 5, padding=2)
        self.branch3x3dbl_1 = ConvBN(cin, 64, 1)
        self.branch3x3dbl_2 = ConvBN(64, 96, 3, padding=1)
        self.branch3x3dbl_3 = ConvBN(96, 96, 3, padding=1)
        self.branch_pool = ConvBN(cin, pool_features, 1)

    def forward(self, x):
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(_avg(x))], 1)


class InceptionB(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = ConvBN(cin, 384, 3, stride=2)
        self.branch3x3dbl_1 = ConvBN(cin, 64, 1)
        self.branch3x3dbl_2 = ConvBN(64, 96, 3, padding=1)
        self.branch3x3dbl_3 = ConvBN(96, 96, 3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, stride=2)], 1)


class InceptionC(nn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = ConvBN(cin, 192, 1)
        self.branch7x7_1 = ConvBN(cin, c7, 1)
        self.branch7x7_2 = ConvBN(c7, c7, (1, 7), padding=(0, 3))
        self.branch7x7_3 = ConvBN(c7, 192, (7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = ConvBN(cin, c7, 1)
        self.branch7x7dbl_2 = ConvBN(c7, c7, (7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = ConvBN(c7, c7, (1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = ConvBN(c7, c7, (7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = ConvBN(c7, 192, (1, 7), padding=(0, 3))
        self.branch_pool = ConvBN(cin, 192, 1)

    def forward(self, x):
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        return torch.cat([
            self.branch1x1(x),
            self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x))),
            bd, self.branch_pool(_avg(x))], 1)


class InceptionD(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = ConvBN(cin, 192, 1)
        self.branch3x3_2 = ConvBN(192, 320, 3, stride=2)
        self.branch7x7x3_1 = ConvBN(cin, 192, 1)
        self.branch7x7x3_2 = ConvBN(192, 192, (1, 7), padding=(0, 3))
        self.branch7x7x3_3 = ConvBN(192, 192, (7, 1), padding=(3, 0))
        self.branch7x7x3_4 = ConvBN(192, 192, 3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
                self.branch7x7x3_1(x)))),
            F.max_pool2d(x, 3, stride=2)], 1)


class InceptionE(nn.Module):
    def __init__(self, cin, pool_kind):
        super().__init__()
        self.pool_kind = pool_kind
        self.branch1x1 = ConvBN(cin, 320, 1)
        self.branch3x3_1 = ConvBN(cin, 384, 1)
        self.branch3x3_2a = ConvBN(384, 384, (1, 3), padding=(0, 1))
        self.branch3x3_2b = ConvBN(384, 384, (3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = ConvBN(cin, 448, 1)
        self.branch3x3dbl_2 = ConvBN(448, 384, 3, padding=1)
        self.branch3x3dbl_3a = ConvBN(384, 384, (1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = ConvBN(384, 384, (3, 1), padding=(1, 0))
        self.branch_pool = ConvBN(cin, 192, 1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        pooled = _avg(x) if self.pool_kind == "avg" else \
            F.max_pool2d(x, 3, stride=1, padding=1)
        return torch.cat([self.branch1x1(x), b3, bd,
                          self.branch_pool(pooled)], 1)


class FIDInception(nn.Module):
    """The exact network pytorch-fid evaluates, attribute names matching
    its state-dict keys."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = ConvBN(3, 32, 3, stride=2)
        self.Conv2d_2a_3x3 = ConvBN(32, 32, 3)
        self.Conv2d_2b_3x3 = ConvBN(32, 64, 3, padding=1)
        self.Conv2d_3b_1x1 = ConvBN(64, 80, 1)
        self.Conv2d_4a_3x3 = ConvBN(80, 192, 3)
        self.Mixed_5b = InceptionA(192, 32)
        self.Mixed_5c = InceptionA(256, 64)
        self.Mixed_5d = InceptionA(288, 64)
        self.Mixed_6a = InceptionB(288)
        self.Mixed_6b = InceptionC(768, 128)
        self.Mixed_6c = InceptionC(768, 160)
        self.Mixed_6d = InceptionC(768, 160)
        self.Mixed_6e = InceptionC(768, 192)
        self.Mixed_7a = InceptionD(768)
        self.Mixed_7b = InceptionE(1280, "avg")
        self.Mixed_7c = InceptionE(2048, "max")
        self.fc = nn.Linear(2048, 1008)

    def forward(self, x):
        h = self.Conv2d_1a_3x3(x)
        h = self.Conv2d_2a_3x3(h)
        h = self.Conv2d_2b_3x3(h)
        h = F.max_pool2d(h, 3, stride=2)
        h = self.Conv2d_3b_1x1(h)
        h = self.Conv2d_4a_3x3(h)
        h = F.max_pool2d(h, 3, stride=2)
        for name in ["Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"]:
            h = getattr(self, name)(h)
        spatial = h[:, :7]  # [N, 7, 17, 17]
        h = self.Mixed_7a(h)
        h = self.Mixed_7b(h)
        h = self.Mixed_7c(h)
        pool3 = h.mean((2, 3))
        return pool3, spatial, self.fc(pool3)


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.Conv2d):
            fan_in = m.weight[0].numel()
            nn.init.normal_(m.weight, std=(2.0 / fan_in) ** 0.5, generator=g)
        elif isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.weight.uniform_(0.5, 1.5, generator=g)
                m.bias.normal_(std=0.1, generator=g)
                m.running_mean.normal_(std=0.1, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
        elif isinstance(m, nn.Linear):
            nn.init.normal_(m.weight, std=0.02, generator=g)
            nn.init.normal_(m.bias, std=0.02, generator=g)


@pytest.fixture(scope="module")
def nets():
    from llamagen_tpu.eval.inception import convert_inception

    oracle = FIDInception().eval()
    _randomize(oracle)
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()
          if "num_batches_tracked" not in k}
    params = convert_inception(sd)
    return oracle, params


def _torch_pipeline(oracle, images_uint8):
    """The exact pytorch-fid preprocessing: /255, bilinear 299 (no
    antialias), [-1, 1]."""
    x = torch.from_numpy(images_uint8).float().permute(0, 3, 1, 2) / 255.0
    x = F.interpolate(x, size=(299, 299), mode="bilinear",
                      align_corners=False)
    with torch.no_grad():
        pool, spatial, logits = oracle(x * 2 - 1)
    # our spatial layout is NHWC-flattened; permute for comparison
    return (pool.numpy(), spatial.permute(0, 2, 3, 1).reshape(len(x), -1).numpy(),
            logits.numpy())


def test_feature_parity_vs_torch_oracle(nets):
    from llamagen_tpu.eval.inception import FeatureExtractor

    oracle, params = nets
    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, size=(4, 128, 128, 3), dtype=np.uint8)

    ex = FeatureExtractor.__new__(FeatureExtractor)
    ex.params = params
    ex.batch_size = 4
    import jax
    from llamagen_tpu.eval import inception as inc
    ex._apply = jax.jit(lambda p, x: inc.apply(p, x))

    pool_j, spatial_j, logits_j = ex.features(images)
    pool_t, spatial_t, logits_t = _torch_pipeline(oracle, images)

    scale = np.abs(pool_t).mean()
    assert np.abs(pool_j - pool_t).max() < 2e-3 * max(scale, 1.0), \
        np.abs(pool_j - pool_t).max()
    np.testing.assert_allclose(spatial_j, spatial_t, atol=2e-2, rtol=1e-3)
    np.testing.assert_allclose(logits_j, logits_t, atol=2e-2, rtol=1e-3)


def test_fid_delta_vs_torch_oracle(nets):
    """End-to-end: FID computed from our features vs the torch pipeline's
    features on the same image pair differs by a negligible amount."""
    from llamagen_tpu.eval.fid import fid_from_activations
    from llamagen_tpu.eval.inception import FeatureExtractor
    import jax
    from llamagen_tpu.eval import inception as inc

    oracle, params = nets
    rng = np.random.RandomState(1)
    a = rng.randint(0, 256, size=(8, 64, 64, 3), dtype=np.uint8)
    b = np.clip(a.astype(np.int32) + rng.randint(-40, 40, a.shape), 0,
                255).astype(np.uint8)

    ex = FeatureExtractor.__new__(FeatureExtractor)
    ex.params = params
    ex.batch_size = 8
    ex._apply = jax.jit(lambda p, x: inc.apply(p, x))

    pa, _, _ = ex.features(a)
    pb, _, _ = ex.features(b)
    ta, _, _ = _torch_pipeline(oracle, a)
    tb, _, _ = _torch_pipeline(oracle, b)

    # small-N FID on a feature subset (full 2048-dim sqrtm of an 8-sample
    # covariance is numerically degenerate either way)
    fid_ours = fid_from_activations(pa[:, :32], pb[:, :32])
    fid_torch = fid_from_activations(ta[:, :32], tb[:, :32])
    assert abs(fid_ours - fid_torch) < 0.02 * max(fid_torch, 1.0), \
        (fid_ours, fid_torch)
