"""CLIP-score harness tests (weights-gated model; math/pipeline oracle).

The real ViT-B/32 weights are unavailable offline, so the pipeline is
validated with a random tiny CLIP: transformers' FlaxCLIPModel +
CLIPModel (torch) share weights via from_pt conversion, and the torch side
re-implements the reference score math
(`/root/reference/evaluations/t2i/evaluation.py:120-176`) independently.
"""

import numpy as np
import pytest

import conftest  # noqa: F401

import pytest as _pytest

pytestmark = _pytest.mark.slow  # engine/e2e tier (pyproject markers)

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _tiny_clip_config():
    from transformers import CLIPConfig, CLIPTextConfig, CLIPVisionConfig

    return CLIPConfig.from_text_vision_configs(
        CLIPTextConfig(hidden_size=32, intermediate_size=64,
                       num_hidden_layers=2, num_attention_heads=2,
                       max_position_embeddings=77, vocab_size=99),
        CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=2,
                         image_size=32, patch_size=8),
        projection_dim=16)


class _StubTokenizer:
    """Deterministic token ids (the tokenizer itself is transformers',
    exercised only when a real local CLIP dir is supplied)."""

    def __call__(self, texts, **kw):
        ids = np.ones((len(texts), 77), np.int64)
        for i, t in enumerate(texts):
            rng = np.random.RandomState(abs(hash(t)) % (2 ** 31))
            n = min(5 + (abs(hash(t)) % 30), 76)
            ids[i, :n] = rng.randint(1, 99, size=(n,))
        mask = (ids != 1).astype(np.int64)
        mask[:, 0] = 1
        return {"input_ids": ids, "attention_mask": mask}


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    from transformers import CLIPModel, FlaxCLIPModel

    cfg = _tiny_clip_config()
    torch.manual_seed(0)
    pt = CLIPModel(cfg).eval()
    d = tmp_path_factory.mktemp("clip")
    pt.save_pretrained(str(d), safe_serialization=False)
    fx = FlaxCLIPModel.from_pretrained(str(d), from_pt=True)
    return pt, fx


def test_clip_score_matches_torch_oracle(models):
    from llamagen_tpu.eval.clip import ClipScorer, preprocess

    pt, fx = models
    scorer = ClipScorer.__new__(ClipScorer)
    scorer.model = fx
    scorer.tokenizer = _StubTokenizer()
    scorer.batch_size = 3
    scorer.image_size = 32

    def embed(params, pixel_values, input_ids, attention_mask):
        img = fx.get_image_features(pixel_values=pixel_values, params=params)
        txt = fx.get_text_features(input_ids=input_ids,
                                   attention_mask=attention_mask,
                                   params=params)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        return jnp.sum(img * txt, axis=-1)

    scorer._embed = jax.jit(embed)

    rng = np.random.RandomState(1)
    images = rng.randint(0, 256, size=(5, 48, 40, 3), dtype=np.uint8)
    captions = [f"a photo of thing {i}" for i in range(5)]
    ours = scorer.pair_scores(images, captions)

    # independent torch pipeline replicating the reference math
    pix = preprocess(images, 32)  # preprocess itself is PIL-exact
    tok = _StubTokenizer()(captions)
    with torch.no_grad():
        img_f = pt.get_image_features(
            torch.from_numpy(np.transpose(pix, (0, 3, 1, 2))))
        txt_f = pt.get_text_features(
            torch.from_numpy(tok["input_ids"]),
            torch.from_numpy(tok["attention_mask"]))
        img_f = img_f / img_f.norm(dim=-1, keepdim=True)
        txt_f = txt_f / txt_f.norm(dim=-1, keepdim=True)
        # ref :143-156: score = w * max(cos, 0), w = 100 (=2.5 * 40 / logit)
        expected = 100 * torch.clamp((img_f * txt_f).sum(-1), min=0).numpy()

    np.testing.assert_allclose(ours, expected, atol=1e-3, rtol=1e-3)
    assert 0 <= float(np.mean(ours)) <= 100


def test_clip_preprocess_matches_openai_transform():
    """preprocess == clip._transform (PIL bicubic short side + center crop
    + CLIP normalization), checked against a literal PIL reimplementation."""
    from PIL import Image

    from llamagen_tpu.eval.clip import CLIP_MEAN, CLIP_STD, preprocess

    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(50, 70, 3), dtype=np.uint8)
    got = preprocess(img[None], 32)[0]

    pil = Image.fromarray(img)
    w, h = pil.size
    s = 32 / min(w, h)
    pil = pil.resize((round(w * s), round(h * s)), Image.BICUBIC)
    w, h = pil.size
    left, top = (w - 32) // 2, (h - 32) // 2
    ref = np.asarray(pil.crop((left, top, left + 32, top + 32)),
                     np.float32) / 255.0
    ref = (ref - CLIP_MEAN) / CLIP_STD
    np.testing.assert_allclose(got, ref, atol=1e-6)
