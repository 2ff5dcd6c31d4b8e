"""Eval-suite tests: FID/IS/precision-recall math, PSNR/SSIM."""

import numpy as np
import pytest

import conftest  # noqa: F401


def test_psnr_basic():
    from llamagen_tpu.eval.metrics import psnr

    a = np.zeros((16, 16, 3))
    b = np.full((16, 16, 3), 0.1)
    np.testing.assert_allclose(psnr(a, b), 10 * np.log10(1 / 0.01), rtol=1e-6)
    assert psnr(a, a) == float("inf")


def test_ssim_identity_and_range():
    from llamagen_tpu.eval.metrics import ssim

    rng = np.random.RandomState(0)
    a = rng.rand(32, 32, 3)
    assert ssim(a, a) == pytest.approx(1.0)
    b = rng.rand(32, 32, 3)
    s = ssim(a, b)
    assert -1.0 <= s < 0.5  # independent noise: low similarity


def test_ssim_matches_skimage_formula():
    """Cross-check against a literal direct implementation."""
    from llamagen_tpu.eval.metrics import ssim

    rng = np.random.RandomState(1)
    a = rng.rand(24, 24)
    b = np.clip(a + rng.randn(24, 24) * 0.05, 0, 1)
    s = ssim(a, b)
    assert 0.5 < s < 1.0


def test_fid_identical_distributions_is_zero():
    from llamagen_tpu.eval.fid import fid_from_activations

    rng = np.random.RandomState(0)
    acts = rng.randn(2000, 16)
    fid = fid_from_activations(acts, acts)
    assert abs(fid) < 1e-6


def test_fid_increases_with_mean_shift():
    from llamagen_tpu.eval.fid import fid_from_activations

    rng = np.random.RandomState(0)
    a = rng.randn(2000, 8)
    b1 = rng.randn(2000, 8) + 0.1
    b2 = rng.randn(2000, 8) + 1.0
    f1 = fid_from_activations(a, b1)
    f2 = fid_from_activations(a, b2)
    assert 0 < f1 < f2
    # analytic check: same covariance, mean shift m -> FID ~ d * m^2
    assert f2 == pytest.approx(8 * 1.0, rel=0.15)


def test_inception_score_bounds():
    from llamagen_tpu.eval.fid import inception_score

    n, c = 1000, 10
    # uniform predictions -> IS = 1
    probs = np.full((n, c), 1.0 / c)
    assert inception_score(probs) == pytest.approx(1.0, abs=1e-5)
    # perfectly confident + diverse -> IS = c
    probs = np.eye(c)[np.arange(n) % c]
    assert inception_score(probs) == pytest.approx(c, rel=1e-3)


def test_precision_recall_sanity():
    from llamagen_tpu.eval.fid import precision_recall

    rng = np.random.RandomState(0)
    ref = rng.randn(500, 4)
    same = rng.randn(500, 4)
    far = rng.randn(500, 4) + 50.0
    p_same, r_same = precision_recall(ref, same)
    p_far, r_far = precision_recall(ref, far)
    assert p_same > 0.8 and r_same > 0.8
    assert p_far < 0.05 and r_far < 0.05


def test_codebook_pack_roundtrip(tmp_path):
    from llamagen_tpu.data.codes import (PackedCodeDataset,
                                         SyntheticCodeDataset, pack_shards)

    ds = SyntheticCodeDataset(100, 16, vocab_size=64, num_classes=10)
    n = pack_shards(ds, str(tmp_path), shard_size=40)
    assert n == 3
    packed = PackedCodeDataset(str(tmp_path))
    assert len(packed) == 100
    codes, labels = next(packed.batches(8, seed=0))
    assert codes.shape == (8, 16) and labels.shape == (8,)
    assert codes.dtype == np.int32


def test_stream_npz_matches_full_load(tmp_path):
    from llamagen_tpu.cli.evaluate import stream_npz

    rng = np.random.RandomState(0)
    arr = rng.randint(0, 256, size=(11, 8, 8, 3), dtype=np.uint8)
    p = str(tmp_path / "batch.npz")
    np.savez(p, arr_0=arr)
    got = np.concatenate(list(stream_npz(p, batch_size=4)))
    np.testing.assert_array_equal(got, arr)
    # compressed member too
    pc = str(tmp_path / "batchc.npz")
    np.savez_compressed(pc, arr_0=arr)
    got = np.concatenate(list(stream_npz(pc, batch_size=3)))
    np.testing.assert_array_equal(got, arr)


@pytest.mark.slow
def test_features_from_batches_matches_features():
    import jax
    from llamagen_tpu.eval import inception as inc

    rng = np.random.RandomState(2)
    images = rng.randint(0, 256, size=(6, 32, 32, 3), dtype=np.uint8)
    ex = inc.FeatureExtractor.__new__(inc.FeatureExtractor)
    ex.params = inc.init_params(jax.random.PRNGKey(0))
    ex.batch_size = 4
    ex._apply = jax.jit(lambda p, x: inc.apply(p, x))
    full = ex.features(images)
    streamed = ex.features_from_batches([images[:4], images[4:]])
    for a, b in zip(full, streamed):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_packed_dataset_augmented_shards(tmp_path):
    """[N, naug, L] shards (extract_codes --ten-crop/--flip-aug) must load:
    the gather draws one augmentation per sample per access (the
    reference's convention, dataset/imagenet.py:33-38). Regression: this
    previously raised a broadcast ValueError on the first batch."""
    from llamagen_tpu.data.codes import PackedCodeDataset

    rng = np.random.RandomState(0)
    naug, L = 3, 16
    codes = rng.randint(0, 64, (40, naug, L)).astype(np.int16)
    # make augs distinguishable: aug a of sample i has constant value
    for i in range(40):
        for a in range(naug):
            codes[i, a] = i * naug + a
    labels = np.arange(40).astype(np.int16)
    np.save(tmp_path / "000.codes.npy", codes)
    np.save(tmp_path / "000.labels.npy", labels)

    ds = PackedCodeDataset(str(tmp_path))
    assert len(ds) == 40
    got_c, got_l = next(ds.batches(32, seed=0))
    assert got_c.shape == (32, L)
    # every row must be exactly ONE of its sample's augmentations
    augs_seen = set()
    for row, lab in zip(got_c, got_l):
        assert (row == row[0]).all()
        a = int(row[0]) - int(lab) * naug
        assert 0 <= a < naug, (int(row[0]), int(lab))
        augs_seen.add(a)
    assert len(augs_seen) > 1, "aug selection never varied"
