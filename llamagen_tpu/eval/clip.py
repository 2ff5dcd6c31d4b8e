"""CLIP score for t2i evaluation (JAX/Flax CLIP).

Equivalent of `/root/reference/evaluations/t2i/evaluation.py:120-176`
(GigaGAN protocol): ViT-B/32 CLIP, image/text embeddings L2-normalized,
score = 100 * max(cosine, 0), averaged over the dataset.

Weights-gated like the Inception extractor: pass a LOCAL HuggingFace CLIP
directory (config + flax/torch weights + tokenizer files) — this
environment has no egress, so nothing is downloaded. The score math and
preprocessing are oracle-tested against a torch CLIP on random weights.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

# openai CLIP preprocessing constants (ref uses the `clip` package whose
# _transform = Resize(224, bicubic) + CenterCrop + normalize)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess(images_uint8: np.ndarray, size: int = 224) -> np.ndarray:
    """uint8 [N,H,W,3] -> normalized [N,size,size,3].

    Exactly clip._transform (the transform the reference's `clip.load`
    returns): PIL bicubic resize of the short side to `size` (antialiased),
    center crop, /255, normalize with the CLIP mean/std."""
    from PIL import Image

    out = np.empty((len(images_uint8), size, size, 3), np.float32)
    for i, arr in enumerate(images_uint8):
        img = Image.fromarray(arr)
        w, h = img.size
        scale = size / min(w, h)
        img = img.resize((round(w * scale), round(h * scale)),
                         Image.BICUBIC)
        w, h = img.size
        left, top = (w - size) // 2, (h - size) // 2
        img = img.crop((left, top, left + size, top + size))
        out[i] = np.asarray(img, np.float32) / 255.0
    return (out - CLIP_MEAN) / CLIP_STD


class ClipScorer:
    """Batched CLIP-score computation over (image, caption) pairs."""

    def __init__(self, model_dir: str, batch_size: int = 64):
        from transformers import CLIPTokenizerFast, FlaxCLIPModel

        # local directory only (no hub); from_pt converts torch weights
        try:
            self.model = FlaxCLIPModel.from_pretrained(
                model_dir, local_files_only=True)
        except (OSError, EnvironmentError):
            self.model = FlaxCLIPModel.from_pretrained(
                model_dir, local_files_only=True, from_pt=True)
        self.tokenizer = CLIPTokenizerFast.from_pretrained(
            model_dir, local_files_only=True)
        self.batch_size = batch_size
        self.image_size = self.model.config.vision_config.image_size

        def embed(params, pixel_values, input_ids, attention_mask):
            img = self.model.get_image_features(
                pixel_values=pixel_values, params=params)
            txt = self.model.get_text_features(
                input_ids=input_ids, attention_mask=attention_mask,
                params=params)
            img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
            txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
            return jnp.sum(img * txt, axis=-1)

        self._embed = jax.jit(embed)

    def pair_scores(self, images_uint8: np.ndarray,
                    captions: List[str]) -> np.ndarray:
        """100 * max(cos(img_i, txt_i), 0) per pair (ref :143-156)."""
        assert len(images_uint8) == len(captions)
        out = []
        for i in range(0, len(captions), self.batch_size):
            imgs = preprocess(np.ascontiguousarray(
                images_uint8[i:i + self.batch_size]), self.image_size)
            # FlaxCLIP expects NCHW pixel_values
            imgs = jnp.transpose(imgs, (0, 3, 1, 2))
            tok = self.tokenizer(captions[i:i + self.batch_size],
                                 padding="max_length", truncation=True,
                                 max_length=77, return_tensors="np")
            cos = self._embed(self.model.params, imgs,
                              jnp.asarray(tok["input_ids"]),
                              jnp.asarray(tok["attention_mask"]))
            out.append(np.asarray(cos))
        cos = np.concatenate(out)
        return 100.0 * np.maximum(cos, 0.0)

    def score(self, images_uint8, captions) -> float:
        """Dataset-level CLIP score (mean of pair scores, ref :173-176)."""
        return float(self.pair_scores(images_uint8, captions).mean())
