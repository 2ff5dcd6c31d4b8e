"""T5 text encoder for t2i conditioning (flan-t5-xl, 2048-dim).

TPU-native counterpart of `/root/reference/language/t5.py`: uses the HF
*Flax* T5 encoder so the forward runs through XLA on the TPU (instead of
torch on GPU). Weights must be provided as a local path (this environment
has no network egress); `model_max_length=120` fixed-length tokenization
with attention mask matches the reference (t5.py:58-79).

Also provides the left-padding convention used by the t2i samplers
(`/root/reference/autoregressive/sample/sample_t2i.py:92-106`): valid tokens
right-aligned, embeddings zeroed outside the mask.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from llamagen_tpu.text.cleaning import text_preprocessing


class T5TextEncoder:
    """Tokenize + encode captions with a local flan-t5 checkpoint."""

    def __init__(self, model_path: str, model_max_length: int = 120,
                 use_text_preprocessing: bool = True, dtype=jnp.bfloat16):
        from transformers import AutoTokenizer, FlaxT5EncoderModel

        self.tokenizer = AutoTokenizer.from_pretrained(model_path)
        self.model = FlaxT5EncoderModel.from_pretrained(
            model_path, dtype=dtype)
        self.model_max_length = model_max_length
        self.use_text_preprocessing = use_text_preprocessing

    def get_text_embeddings(self, texts: List[str]
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """texts -> (embeddings [B, T, 2048], attention mask [B, T])."""
        texts = [text_preprocessing(t, self.use_text_preprocessing)
                 for t in texts]
        tok = self.tokenizer(
            texts, max_length=self.model_max_length, padding="max_length",
            truncation=True, return_attention_mask=True,
            add_special_tokens=True, return_tensors="np")
        out = self.model(input_ids=jnp.asarray(tok["input_ids"]),
                         attention_mask=jnp.asarray(tok["attention_mask"]))
        return out.last_hidden_state, jnp.asarray(tok["attention_mask"])


def left_pad_embeddings(emb: np.ndarray, mask: np.ndarray
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Right-align valid caption tokens (ref: sample_t2i.py:92-106).

    emb: [B, T, C] right-padded T5 output; mask: [B, T] 1=valid.
    Returns (left-padded embeddings with zeros outside the mask,
    left-padded mask).
    """
    emb = np.asarray(emb)
    mask = np.asarray(mask)
    b, t, _ = emb.shape
    new_emb = np.zeros_like(emb)
    new_mask = np.zeros_like(mask)
    for i in range(b):
        valid_n = int(mask[i].sum())
        new_emb[i, t - valid_n:] = emb[i, :valid_n]
        new_mask[i, t - valid_n:] = 1
    return new_emb, new_mask
